"""Incremental IVF ANN index (operators/ann_index): frozen centroids +
ledgered assignment epochs; probe-all == brute force; replay no-op."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from neosync_spark.operators.ann_index import (
    create_ivf_index,
    ivf_index_sync,
    ivf_index_topk,
    load_centroids,
)
from neosync_spark.operators.similarity import cosine_topk


def _vecs(spark, n=60, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.normal(size=dim).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_incremental_equals_brute_force_probe_all(spark, tmp_path):
    emb = _vecs(spark)
    idx = create_ivf_index(
        spark, str(tmp_path / "idx"), emb, "embedding", "vec_id",
        n_centroids=4, n_buckets=4,
    )
    ivf_index_sync(idx, emb.filter(F.col("vec_id") < 30), "embedding",
                   "vec_id", applied_range=(0, 30))
    ivf_index_sync(idx, emb.filter(F.col("vec_id") >= 30), "embedding",
                   "vec_id", applied_range=(30, 60))
    assert idx.read().count() == 60
    q = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    got = ivf_index_topk(idx, q, k=5, n_probe=4)
    want = cosine_topk(emb, "embedding", "vec_id", q, k=5)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_epoch_replay_is_noop(spark, tmp_path):
    emb = _vecs(spark, n=20)
    idx = create_ivf_index(
        spark, str(tmp_path / "idx"), emb, "embedding", "vec_id",
        n_centroids=2, n_buckets=2,
    )
    info1 = ivf_index_sync(idx, emb, "embedding", "vec_id", applied_range=(0, 20))
    sid = idx.manifest(refresh=True)["snapshot_id"]
    info2 = ivf_index_sync(idx, emb, "embedding", "vec_id", applied_range=(0, 20))
    assert info2.rows_written == 0
    assert idx.manifest(refresh=True)["snapshot_id"] == sid
    assert idx.read().count() == 20


def test_partial_probe_prunes_and_keeps_recall_on_easy_query(spark, tmp_path):
    """With n_probe=1 the scan covers ~1/k of the corpus; the query's
    own cell contains it, so the top hit is still itself."""
    emb = _vecs(spark, n=80)
    idx = create_ivf_index(
        spark, str(tmp_path / "idx"), emb, "embedding", "vec_id",
        n_centroids=4, n_buckets=4,
    )
    ivf_index_sync(idx, emb, "embedding", "vec_id", applied_range=(0, 80))
    q = emb.filter(F.col("vec_id") == 11).collect()[0]["embedding"]
    got = ivf_index_topk(idx, q, k=1, n_probe=1)
    assert got.collect()[0]["vec_id"] == 11
    # cells partition the corpus
    cells = idx.read().groupBy("cell").count().collect()
    assert sum(r["count"] for r in cells) == 80 and len(cells) >= 2


def test_centroids_frozen_across_epochs(spark, tmp_path):
    emb = _vecs(spark, n=30)
    idx = create_ivf_index(
        spark, str(tmp_path / "idx"), emb.filter(F.col("vec_id") < 15),
        "embedding", "vec_id", n_centroids=3, n_buckets=2,
    )
    before = load_centroids(idx)
    ivf_index_sync(idx, emb.filter(F.col("vec_id") < 15), "embedding",
                   "vec_id", applied_range=(0, 15))
    ivf_index_sync(idx, emb.filter(F.col("vec_id") >= 15), "embedding",
                   "vec_id", applied_range=(15, 30))
    after = load_centroids(idx)
    assert np.array_equal(before, after)


def test_query_reads_only_probe_cell_buckets_never_corpus(spark, tmp_path):
    """The scale contract (VERDICT r3 #4): a query's scan opens ONLY
    files in the probed cells' hash buckets — the index carries the
    vector payload, so the corpus table contributes zero input files."""
    from neosync_spark.lakehouse import bucket_expr
    from neosync_spark.operators.ann_index import load_centroids
    import numpy as np

    emb = _vecs(spark, n=120)
    idx = create_ivf_index(
        spark, str(tmp_path / "idx"), emb, "embedding", "vec_id",
        n_centroids=6, n_buckets=8,
    )
    ivf_index_sync(idx, emb, "embedding", "vec_id", applied_range=(0, 120))
    q = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]

    cent = load_centroids(idx)
    cn = cent / (np.linalg.norm(cent, axis=1, keepdims=True) + 1e-12)
    qn = np.asarray(q) / (np.linalg.norm(q) + 1e-12)
    probe = np.argsort(-(cn @ qn))[:2].tolist()
    want_buckets = {
        int(r[0])
        for r in spark.createDataFrame([(int(c),) for c in probe], "cell int")
        .select(bucket_expr("cell", 8)).collect()
    }

    out = ivf_index_topk(idx, q, k=3, n_probe=2)
    files = out.inputFiles()
    assert files, "expected a parquet-backed scan"
    for f in files:
        assert "/idx/" in f, f"corpus file leaked into the query scan: {f}"
        b = int(f.split("_bucket=")[1].split("/")[0])
        assert b in want_buckets, f"non-probe bucket {b} opened (want {want_buckets})"
    # pruning is real: fewer input files than a full-index read
    assert len(files) < len(idx.read().inputFiles())
