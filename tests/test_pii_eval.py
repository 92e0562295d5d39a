"""Quantified recall of the PII recognizers (VERDICT r4 task #6).

The claim under test: the builtin regex/dataset tier misses names
outside its vocabulary (non-Western spellings), and the
``custom_recognizers`` hook — fed a dictionary-boosted fake model —
closes exactly that gap without touching emails/phones. The report
runs the real ``transform_pii_text`` Arrow path end-to-end.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.functions import transformers as X
from neosync_spark.operators.pii_eval import (
    NON_WESTERN_NAMES,
    dictionary_ner_scorer,
    labeled_pii_fixture,
    pii_recall_report,
)


def _report(spark, n=64):
    fixture = labeled_pii_fixture(
        spark.range(n).withColumnRenamed("id", "doc_id")
    )
    tiers = {
        "builtin": X.transform_pii_text(recognize_person_names=True),
        "hooked": X.transform_pii_text(
            recognize_person_names=True,
            custom_recognizers={"PERSON": dictionary_ner_scorer()},
        ),
    }
    rep = pii_recall_report(fixture, tiers)
    return {
        (r["tier"], r["entity"]): r for r in rep.collect()
    }


def test_builtin_misses_exactly_the_unknown_names(spark):
    got = _report(spark)
    bp = got[("builtin", "PERSON")]
    assert bp["n_gold"] == 64
    assert bp["n_detected"] == 32  # the dataset-name half
    assert abs(bp["recall"] - 0.5) < 1e-9
    assert bp["precision"] == 1.0


def test_hook_closes_the_person_gap(spark):
    got = _report(spark)
    hp = got[("hooked", "PERSON")]
    assert hp["n_detected"] == hp["n_gold"] == 64
    assert hp["recall"] == 1.0 and hp["precision"] == 1.0


def test_structured_entities_unaffected_by_tier(spark):
    got = _report(spark)
    for tier in ("builtin", "hooked"):
        for ent in ("EMAIL_ADDRESS", "PHONE_NUMBER"):
            r = got[(tier, ent)]
            assert r["recall"] == 1.0 and r["precision"] == 1.0, (tier, ent, r)


def test_fixture_is_deterministic_and_labeled(spark):
    f1 = labeled_pii_fixture(
        spark.range(16).withColumnRenamed("id", "doc_id")
    ).collect()
    f2 = labeled_pii_fixture(
        spark.range(16).withColumnRenamed("id", "doc_id")
    ).collect()
    assert f1 == f2
    for r in f1:
        assert r["gold_person"] in r["text"]
        assert r["gold_email"] in r["text"]
        assert r["gold_phone"] in r["text"]
        if not r["is_dataset_name"]:
            assert r["gold_person"] in NON_WESTERN_NAMES


def test_scorer_finds_every_occurrence(spark):
    import pandas as pd

    scorer = dictionary_ner_scorer(("Zhang Wei",))
    spans = scorer(pd.Series(["Zhang Wei met Zhang Wei", None, "nobody"]))
    assert spans[0] == [(0, 9, 1.0), (14, 23, 1.0)]
    assert spans[1] == [] and spans[2] == []


def test_heuristic_tier_closes_gap_without_a_model(spark):
    fixture = labeled_pii_fixture(
        spark.range(32).withColumnRenamed("id", "doc_id")
    )
    rep = pii_recall_report(
        fixture,
        {
            "heuristic": X.transform_pii_text(
                recognize_person_names=True, person_heuristic=True
            )
        },
    )
    got = {(r["tier"], r["entity"]): r for r in rep.collect()}
    hp = got[("heuristic", "PERSON")]
    assert hp["n_detected"] == hp["n_gold"] == 32
    assert hp["recall"] == 1.0 and hp["precision"] == 1.0
    for ent in ("EMAIL_ADDRESS", "PHONE_NUMBER"):
        r = got[("heuristic", ent)]
        assert r["recall"] == 1.0 and r["precision"] == 1.0


def test_heuristic_scorer_shapes():
    import pandas as pd

    s = X.heuristic_person_scorer()

    def spans_of(t):
        return [t[a:b] for a, b, _ in s(pd.Series([t]))[0]]

    # stopword edges trim; the name survives
    assert spans_of("Contact Nguyễn Thảo at x") == ["Nguyễn Thảo"]
    # honorific context lowers the two-token bar
    assert spans_of("Dr Tanaka will attend") == ["Tanaka"]
    # acronyms and lowercase text never match
    assert spans_of("NASA launched USA rockets") == []
    assert spans_of("please email bob smith") == []
    # calendar/sentence words alone never match
    assert spans_of("The meeting is on Monday") == []


def test_heuristic_is_opt_in_and_threshold_gated():
    import pandas as pd

    texts = pd.Series(["Contact Nguyễn Thảo today"])
    keys = pd.Series(["k"])
    # off by default: unknown names survive the builtin tier
    off = X.transform_pii_text(recognize_person_names=True)(texts, keys)
    assert "Nguyễn Thảo" in off.iloc[0]
    # a threshold above the heuristic's 0.85 disables exactly this tier
    gated = X.transform_pii_text(
        recognize_person_names=True,
        person_heuristic=True,
        score_threshold=0.9,
    )(texts, keys)
    assert "Nguyễn Thảo" in gated.iloc[0]
    on = X.transform_pii_text(
        recognize_person_names=True, person_heuristic=True
    )(texts, keys)
    assert "<PERSON>" in on.iloc[0] and "Nguyễn" not in on.iloc[0]
