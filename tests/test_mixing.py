"""DSIR importance resampling: hashed n-gram distributions, importance
log-weights, deterministic Gumbel top-k selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.operators.mixing import (
    dsir_importance,
    dsir_resample,
    hashed_ngram_buckets,
)


def _corpus(spark):
    rows = []
    for i in range(40):
        # target-ish docs talk about physics; the rest about cooking
        if i % 4 == 0:
            rows.append((i, "quantum field theory of the electron spin"))
        else:
            rows.append((i, "slice the onion and saute with butter and salt"))
    rows.append((98, ""))  # no grams
    rows.append((99, "   "))  # whitespace only
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_score_higher(spark):
    docs = _corpus(spark)
    target = docs.filter((F.col("doc_id") % 4 == 0) & (F.col("doc_id") < 90))
    scored = dsir_importance(docs, target, "text", "doc_id", n_buckets=256)
    pdf = scored.toPandas().set_index("doc_id")
    phys = [pdf.loc[i, "log_importance"] for i in range(0, 40, 4)]
    cook = [pdf.loc[i, "log_importance"] for i in range(40) if i % 4]
    assert min(phys) > max(cook)
    # gram counts: unigrams + bigrams = 2*len - 1
    assert pdf.loc[0, "n_grams"] == 7 + 6
    assert pdf.loc[98, "n_grams"] == 0 and pdf.loc[98, "log_importance"] == 0.0
    assert pdf.loc[99, "n_grams"] == 0


def test_resample_exact_k_and_deterministic(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 4 == 0)
    scored = dsir_importance(docs, target, "text", "doc_id", n_buckets=256)
    sel1 = dsir_resample(scored, "doc_id", k=10, seed=7)
    ids1 = {r["doc_id"] for r in sel1.filter("selected").collect()}
    assert len(ids1) == 10
    # pure function of (seed, id): same under a different partitioning
    sel2 = dsir_resample(scored.repartition(13), "doc_id", k=10, seed=7)
    ids2 = {r["doc_id"] for r in sel2.filter("selected").collect()}
    assert ids1 == ids2
    # a different seed draws a different sample in the stochastic tail
    # (k=20 > the 10 dominant docs, so 10 slots are noise-decided)
    tail7 = {
        r["doc_id"]
        for r in dsir_resample(scored, "doc_id", k=20, seed=7)
        .filter("selected")
        .collect()
    }
    tail8 = {
        r["doc_id"]
        for r in dsir_resample(scored, "doc_id", k=20, seed=8)
        .filter("selected")
        .collect()
    }
    assert tail7 != tail8
    # importance steers the sample: target-like docs overrepresented
    # (10 physics docs of 42, but they dominate the selection)
    assert sum(1 for i in ids1 if i % 4 == 0 and i < 90) >= 8


def test_resample_k_exceeds_corpus(spark):
    docs = _corpus(spark)
    scored = dsir_importance(
        docs, docs.limit(5), "text", "doc_id", n_buckets=64
    )
    sel = dsir_resample(scored, "doc_id", k=1000, seed=1)
    assert sel.filter("selected").count() == 42


def test_bucket_rows_shape(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    b = hashed_ngram_buckets(docs, "text", "doc_id", n_buckets=16)
    rows = b.collect()
    # 3 unigrams + 2 bigrams
    assert len(rows) == 5
    assert all(0 <= r["_b"] < 16 for r in rows)
