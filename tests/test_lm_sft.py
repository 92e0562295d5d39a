"""Unigram LM perplexity scoring, SFT example extraction, and
cross-conversation template detection."""

from __future__ import annotations

import math

from neosync_spark.operators.conversations import sft_examples, template_turns
from neosync_spark.operators.lm import lm_cross_entropy, unigram_lm

LN2 = 0.6931471805599453


# ------------------------------------------------------------------- lm

def test_lm_hand_computed(spark):
    ref = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    model = unigram_lm(ref)
    got = {
        r["doc_id"]: r
        for r in lm_cross_entropy(docs, model, add_k=0.5).collect()
    }
    # T=3, V=2, denom = 3 + 0.5*3 = 4.5
    ce = -(
        math.log(2.5 / 4.5) + math.log(1.5 / 4.5) + math.log(0.5 / 4.5)
    ) / 3
    d1 = got[1]
    assert d1["n_tokens"] == 3
    assert d1["oov_frac"] == 0.3333
    assert abs(d1["cross_entropy"] - math.floor(ce * 1e4 + 0.5) / 1e4) < 1e-9
    assert abs(
        d1["bits_per_token"] - math.floor(ce / LN2 * 1e4 + 0.5) / 1e4
    ) < 1e-9
    # zero-token doc keeps a row with NULL scores
    d2 = got[2]
    assert d2["n_tokens"] == 0 and d2["cross_entropy"] is None


def test_lm_reference_scores_lower_than_shifted(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows += [(100 + i, "zzz qqq xxx www vvv uuu ttt sss") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram_lm(docs.filter("doc_id < 100"))
    out = lm_cross_entropy(docs, model).collect()
    in_dist = [r["cross_entropy"] for r in out if r["doc_id"] < 100]
    shifted = [r["cross_entropy"] for r in out if r["doc_id"] >= 100]
    assert max(in_dist) < min(shifted)
    oov = {r["doc_id"]: r["oov_frac"] for r in out}
    assert oov[100] == 1.0 and oov[0] == 0.0


def test_lm_shuffled_join_same_result(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common") for i in range(30)],
        "doc_id long, text string",
    )
    model = unigram_lm(docs)
    a = sorted(
        map(tuple, lm_cross_entropy(docs, model, broadcast_model=True).collect())
    )
    b = sorted(
        map(tuple, lm_cross_entropy(docs, model, broadcast_model=False).collect())
    )
    assert a == b


# ----------------------------------------------------------- sft_examples

def _conv(spark):
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "how are you"),
        ("c1", 3, "assistant", "fine"),
        ("c2", 0, "assistant", "welcome"),  # no prior context
        ("c3", 0, "user", None),  # NULL text: dropped entirely
        ("c3", 1, "assistant", "ok"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_sft_full_context(spark):
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(_conv(spark), context_budget_chars=2048).collect()
    }
    assert len(out) == 4
    e = out[("c1", 3)]
    assert e["context"] == "user: hi\nassistant: hello\nuser: how are you"
    assert e["n_context_turns"] == 3
    assert e["context_chars"] == len(e["context"])
    assert e["target"] == "fine"
    assert out[("c1", 1)]["context"] == "user: hi"
    # first-turn assistant: empty context, still an example
    w = out[("c2", 0)]
    assert w["context"] == "" and w["n_context_turns"] == 0 and w["context_chars"] == 0
    # NULL-text user turn contributed nothing to c3's context
    assert out[("c3", 1)]["context"] == "" and out[("c3", 1)]["n_context_turns"] == 0


def test_sft_left_truncation_whole_turns(spark):
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(_conv(spark), context_budget_chars=20).collect()
    }
    # costs at c1 turn 3: "user: hi"(9) "assistant: hello"(17) "user: how are you"(18)
    # budget+1 = 21: only the last prior turn fits
    e = out[("c1", 3)]
    assert e["context"] == "user: how are you" and e["n_context_turns"] == 1
    # budget 26 fits the last two? 18+17=35 > 27 -> still 1
    out26 = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(_conv(spark), context_budget_chars=26).collect()
    }
    assert out26[("c1", 3)]["n_context_turns"] == 1
    # budget 35: 18+17=35 <= 36 -> 2 turns, joined chars = 16+17+1 = 34
    out35 = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(_conv(spark), context_budget_chars=35).collect()
    }
    e35 = out35[("c1", 3)]
    assert e35["n_context_turns"] == 2
    assert e35["context"] == "assistant: hello\nuser: how are you"
    assert e35["context_chars"] == 34


def test_sft_budget_zero_means_no_context(spark):
    out = sft_examples(_conv(spark), context_budget_chars=0).collect()
    assert all(r["n_context_turns"] == 0 and r["context"] == "" for r in out)


# ---------------------------------------------------------- template_turns

def test_template_detection(spark):
    rows = []
    for c in range(5):
        rows.append((f"c{c}", 0, "assistant", "  How can I  help you? "))
        rows.append((f"c{c}", 1, "user", f"unique question {c}"))
    rows.append(("c0", 2, "assistant", "how can i help you?"))  # same conv repeat
    rows.append(("c9", 0, "user", None))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = template_turns(df, min_convs=3).collect()
    assert len(out) == 1
    t = out[0]
    # normalization: lowercase + collapsed/trimmed whitespace
    assert t["sample_text"] == "how can i help you?"
    assert t["role"] == "assistant"
    assert t["n_convs"] == 5
    assert t["n_occurrences"] == 6  # within-conv repeat counts as occurrence
    # raising the bar drops it
    assert template_turns(df, min_convs=6).count() == 0
