"""LWW dedup: agg plan == window plan == pandas oracle."""

from __future__ import annotations

from pyspark.sql import functions as F
from neosync_spark.operators.dedup import lww_dedup, lww_dedup_window
from neosync_spark.synth import SynthConfig, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=3_000, n_convs=150)


def _oracle(log):
    df = log.sort_values(["ts", "lsn"], kind="mergesort")
    return (
        df.groupby(["conv_id", "turn_idx"], as_index=False)
        .tail(1)
        .reset_index(drop=True)
    )


def test_lww_agg_matches_oracle(spark):
    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log)
    got = lww_dedup(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"]).toPandas()
    exp = _oracle(log)
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])


def test_lww_window_matches_agg(spark):
    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log)
    a = lww_dedup(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"]).toPandas()
    w = lww_dedup_window(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"]).toPandas()
    assert_pdf_equal(a, w, ["conv_id", "turn_idx"])


def test_lww_agg_is_partial_agg_plan(spark):
    """The agg LWW must plan as partial+final hash agg (map-side combine
    = the skew defense). Assert no Window/Sort in the physical plan."""
    log = generate_pandas(SynthConfig(n_events=500, n_convs=20))
    sdf = spark.createDataFrame(log)
    plan = lww_dedup(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_pack_token_chunks_partitions_docs_exactly(spark):
    """Concat-and-chunk invariants: chunk sizes == budget (except the
    tail), each doc's slices partition its tokens, and the output is
    identical under different partition counts (the distributed prefix
    sum is partitioning-independent)."""
    from pyspark.sql import functions as F

    from neosync_spark.operators.text import pack_token_chunks

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 13) % 40 + 1))) for i in range(50)]
        + [(99, "")],  # empty doc: excluded
        "doc_id long, text string",
    )
    out = pack_token_chunks(docs, "text", "doc_id", budget=32).toPandas()
    assert 99 not in set(out["doc_id"])
    # each doc's slices cover [0, n_tokens) contiguously
    ntok = {i: (i * 13) % 40 + 1 for i in range(50)}
    for i, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        assert grp["doc_tok_start"].iloc[0] == 0
        assert grp["doc_tok_end"].iloc[-1] == ntok[i]
        assert (grp["doc_tok_start"].iloc[1:].to_numpy()
                == grp["doc_tok_end"].iloc[:-1].to_numpy()).all()
    # every chunk holds exactly `budget` tokens except the last
    per_chunk = (
        out.assign(n=out["doc_tok_end"] - out["doc_tok_start"])
        .groupby("chunk_id")["n"].sum().sort_index()
    )
    total = sum(ntok.values())
    assert (per_chunk.iloc[:-1] == 32).all()
    assert per_chunk.sum() == total
    # partition-count independence
    out2 = pack_token_chunks(docs, "text", "doc_id", budget=32, partitions=3).toPandas()
    a = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_gopher_flags_rules(spark):
    from neosync_spark.operators.text import gopher_quality_flags

    good = "the quick brown fox and the lazy dog go to town for it " * 5
    docs = spark.createDataFrame(
        [
            (1, good),                      # passes everything
            (2, "short text the and"),      # too few words
            (3, ("#tag " * 60) + "the and of to"),  # symbol ratio too high
            (4, ""),                        # empty: fails ratio rules, not NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in gopher_quality_flags(docs, "text", "doc_id", min_words=20).collect()
    }
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["ok_words"] is False
    assert got[3]["ok_symbols"] is False
    assert got[4]["keep"] is False and got[4]["ok_alpha"] is False


def test_deterministic_sample_stable_and_sized(spark):
    from neosync_spark.operators.text import deterministic_sample, stratified_sample

    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    s1 = deterministic_sample(df, "doc_id", 0.25, seed=3)
    s2 = deterministic_sample(df.repartition(7), "doc_id", 0.25, seed=3)
    a = sorted(r["doc_id"] for r in s1.collect())
    assert a == sorted(r["doc_id"] for r in s2.collect())  # partition-stable
    assert abs(len(a) / 20_000 - 0.25) < 0.02
    # nested property: a smaller fraction with the same seed is a subset
    s3 = set(r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.1, seed=3).collect())
    assert s3 <= set(a)
    # stratified: per-stratum rates honored
    strat = df.withColumn("src", (F.col("doc_id") % 2 == 0).cast("string"))
    out = stratified_sample(strat, "doc_id", "src", {"true": 0.5, "false": 0.05})
    rates = {
        r["src"]: r["n"] / 10_000
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert abs(rates["true"] - 0.5) < 0.03 and abs(rates["false"] - 0.05) < 0.02


def test_gopher_repetition_rules(spark):
    from neosync_spark.operators.text import gopher_repetition_flags

    docs = spark.createDataFrame(
        [
            (1, "a unique first line\nanother fine line\nthird line here"),
            (2, "same line\nsame line\nsame line"),          # all dup lines
            (3, "go go go go go go"),                        # one 2-gram dominates
            (4, "one two three four five six seven eight"),  # clean
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in gopher_repetition_flags(docs, "text", "doc_id").collect()
    }
    assert got[1]["keep"] is True and got[1]["dup_line_frac"] == 0.0
    assert got[2]["ok_dup_lines"] is False and got[2]["dup_line_frac"] == 1.0
    assert got[3]["ok_top_2gram"] is False and got[3]["top_2gram_frac"] == 1.0
    assert got[4]["keep"] is True


def test_ngram_decontaminate(spark):
    from neosync_spark.operators.text import ngram_decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all here"),
            (3, "quick brown fox jumps over something else entirely now"),
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [(100, "a quick brown fox jumps over fences")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_overlap_grams"], r["contaminated"])
        for r in ngram_decontaminate(train, evals, "text", "doc_id", n=4).collect()
    }
    # 4-grams of eval: "a quick brown fox", "quick brown fox jumps",
    # "brown fox jumps over", "fox jumps over fences"
    assert out[1] == (2, True)   # shares "quick brown fox jumps", "brown fox jumps over"
    assert out[2] == (0, False)
    assert out[3] == (2, True)
    # forced-broadcast variant agrees
    out_b = {
        r["doc_id"]: r["n_overlap_grams"]
        for r in ngram_decontaminate(
            train, evals, "text", "doc_id", n=4, broadcast_eval=True
        ).collect()
    }
    assert out_b == {k: v[0] for k, v in out.items()}


def test_gopher_repetition_ngram_extensions(spark):
    from neosync_spark.operators.text import gopher_repetition_flags

    rep = "alpha beta gamma delta epsilon " * 8  # dup 5-grams everywhere
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, rep.strip()),
            (3, "go go go stop go go go stop stop stop here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in gopher_repetition_flags(docs, "text", "doc_id").collect()
    }
    assert got[1]["keep"] is True and got[1]["dup_5gram_char_frac"] == 0.0
    # heavy 5-gram repetition: most chars sit in duplicated 5-grams
    assert got[2]["ok_dup_5gram"] is False
    assert got[2]["dup_5gram_char_frac"] > 0.5
    # 'go go go' dominates 3-grams
    assert got[3]["top_3gram_frac"] > 0.18 and got[3]["ok_top_3gram"] is False


def test_c4_quality_flags(spark):
    from neosync_spark.operators.text import c4_quality_flags

    docs = spark.createDataFrame(
        [
            (1, "This is a good sentence line right here.\n"
                "Another proper sentence with plenty of words follows.\n"
                "And a third one closes the page neatly."),
            (2, "short.\ntiny line.\nwee."),                   # no >=5-word lines
            (3, "This page talks about javascript frameworks today.\n"
                "More javascript content in every single line here."),
            (4, "Fine sentence one is right here today.\n"
                "lorem ipsum dolor sit amet and more.\n"
                "Third proper sentence rounds this out."),
            (5, "A page with code blocks { inside it.\n"
                "Otherwise this sentence would be quite acceptable.\n"
                "Final sentence keeps the page long enough."),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in c4_quality_flags(docs, "text", "doc_id").collect()
    }
    assert got[1]["keep"] is True and got[1]["n_kept_lines"] == 3
    assert got[2]["keep"] is False          # every line under the word floor
    assert got[3]["n_kept_lines"] == 0 and got[3]["keep"] is False
    assert got[4]["has_lorem_ipsum"] is True and got[4]["keep"] is False
    assert got[5]["has_brace"] is True and got[5]["keep"] is False
