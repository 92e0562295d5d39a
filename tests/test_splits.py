"""Leakage-safe split assignment: cluster-granularity membership,
determinism, fraction calibration, and the leakage audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neosync_spark.operators.splits import (
    leakage_safe_splits,
    split_leakage_report,
)

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"document body {i}") for i in range(n)],
        "doc_id long, text string",
    )


def _clusters(spark):
    # three clusters: {0,1,2}, {10,11}, {20,21,22,23}
    rows = [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)] + [
        (i, 20) for i in range(20, 24)
    ]
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def test_cluster_members_share_split(spark):
    docs, clusters = _docs(spark), _clusters(spark)
    out = leakage_safe_splits(docs, "doc_id", clusters, FRACS, seed=7)
    got = {r.doc_id: r.split for r in out.collect()}
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]
    assert got[20] == got[21] == got[22] == got[23]
    assert split_leakage_report(out, clusters, "doc_id").count() == 0


def test_doc_level_split_leaks_and_audit_catches_it(spark):
    # the control experiment: assign per-doc (clusters=None) and the
    # audit over the same cluster map finds straddlers (with 9 clustered
    # docs across 3 clusters at an 80/10/10 draw a straddle is near
    # certain for this seed — pinned deterministic)
    docs, clusters = _docs(spark), _clusters(spark)
    naive = leakage_safe_splits(docs, "doc_id", None, FRACS, seed=7)
    leaks = split_leakage_report(naive, clusters, "doc_id")
    assert leaks.count() > 0


def test_deterministic_and_stable_under_growth(spark):
    docs, clusters = _docs(spark), _clusters(spark)
    a = leakage_safe_splits(docs, "doc_id", clusters, FRACS, seed=7)
    b = leakage_safe_splits(docs, "doc_id", clusters, FRACS, seed=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # adding NEW docs never moves existing assignments
    more = _docs(spark, 600)
    c = leakage_safe_splits(more, "doc_id", clusters, FRACS, seed=7)
    old = {r.doc_id: r.split for r in a.select("doc_id", "split").collect()}
    new = {r.doc_id: r.split for r in c.select("doc_id", "split").collect()}
    assert all(new[k] == v for k, v in old.items())


def test_fractions_calibrate(spark):
    docs = _docs(spark, 5000)
    out = leakage_safe_splits(docs, "doc_id", None, FRACS, seed=3)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_bad_fractions_raise(spark):
    docs = _docs(spark, 10)
    with pytest.raises(ValueError):
        leakage_safe_splits(docs, "doc_id", None, {}, seed=1)
    with pytest.raises(ValueError):
        leakage_safe_splits(docs, "doc_id", None, {"train": 0.5}, seed=1)


def test_no_shuffle_without_clusters(spark):
    # doc-level assignment is one JVM projection: no Exchange in plan
    docs = _docs(spark, 100)
    out = leakage_safe_splits(docs, "doc_id", None, FRACS, seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cluster_map_broadcasts(spark):
    # the corpus side must never shuffle: the (small) cluster map
    # broadcasts explicitly, stats or no stats
    docs, clusters = _docs(spark, 100), _clusters(spark)
    out = leakage_safe_splits(docs, "doc_id", clusters, FRACS, seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan and "SortMergeJoin" not in plan
