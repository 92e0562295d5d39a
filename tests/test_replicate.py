"""Incremental cross-lakehouse replication (plans/replicate.py)."""
from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.plans.replicate import replica_schema, replicate_incremental
from neosync_spark.schema import KEY_COLS, transcript_schema


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk_primary(spark):
    return SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="ns_rep_src_"),
        transcript_schema(), key_cols=KEY_COLS, n_buckets=4,
    )


def _mk_replica(spark):
    return SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="ns_rep_dst_"),
        replica_schema(transcript_schema()), key_cols=KEY_COLS, n_buckets=4,
    )


def _src_state(t):
    return sorted(
        tuple(r) for r in
        t.read().select("conv_id", "turn_idx", "role", "text", "ts").collect()
    )


def _dst_state(t):
    return sorted(
        tuple(r) for r in
        t.read().select(
            "conv_id", "turn_idx", "role", "text", F.col("src_ts").alias("ts")
        ).collect()
    )


def _sid(t):
    return t.manifest(refresh=True)["snapshot_id"]


class TestReplicate:
    def test_bootstrap_then_incremental(self, spark):
        src, dst = _mk_primary(spark), _mk_replica(spark)
        src.merge_cdc(_ev(spark, [
            ("c-1", 0, "user", "a", None, 1000.0, 1, "insert"),
            ("c-2", 0, "user", "b", None, 1001.0, 2, "insert"),
        ]), applied_range=(0, 3), source_is_raw=True)
        s1 = _sid(src)
        replicate_incremental(src, dst, s1)  # bootstrap
        assert _dst_state(dst) == _src_state(src)
        # updates + a delete, then the diff-only hop
        src.merge_cdc(_ev(spark, [
            ("c-1", 0, "user", "a-v2", None, 2000.0, 10, "update"),
            ("c-2", 0, None, None, None, 2001.0, 11, "delete"),
            ("c-3", 0, "user", "c", None, 2002.0, 12, "insert"),
        ]), applied_range=(10, 13), source_is_raw=True)
        replicate_incremental(src, dst, _sid(src), from_snapshot_id=s1)
        # the diff emits the delete with its PRE-IMAGE ts (1001 — older
        # than the replica's stored row came with) — the hop ordinal
        # must still apply it
        assert _dst_state(dst) == _src_state(src)
        assert not [r for r in _dst_state(dst) if r[0] == "c-2"]

    def test_hops_compose(self, spark):
        src = _mk_primary(spark)
        src.merge_cdc(_ev(spark, [
            ("c-1", 0, "user", "a", None, 1000.0, 1, "insert"),
        ]), applied_range=(0, 2), source_is_raw=True)
        s1 = _sid(src)
        src.merge_cdc(_ev(spark, [
            ("c-1", 1, "assistant", "b", None, 1001.0, 5, "insert"),
        ]), applied_range=(5, 6), source_is_raw=True)
        s2 = _sid(src)
        src.merge_cdc(_ev(spark, [
            ("c-1", 0, "user", "a-v2", None, 1002.0, 9, "update"),
        ]), applied_range=(9, 10), source_is_raw=True)
        s3 = _sid(src)
        two_hop, one_hop = _mk_replica(spark), _mk_replica(spark)
        replicate_incremental(src, two_hop, s1)
        replicate_incremental(src, two_hop, s2, from_snapshot_id=s1)
        replicate_incremental(src, two_hop, s3, from_snapshot_id=s2)
        replicate_incremental(src, one_hop, s1)
        replicate_incremental(src, one_hop, s3, from_snapshot_id=s1)
        assert _dst_state(two_hop) == _dst_state(one_hop) == _src_state(src)

    def test_rerun_hop_is_noop(self, spark):
        src, dst = _mk_primary(spark), _mk_replica(spark)
        src.merge_cdc(_ev(spark, [
            ("c-1", 0, "user", "a", None, 1000.0, 1, "insert"),
        ]), applied_range=(0, 2), source_is_raw=True)
        s1 = _sid(src)
        replicate_incremental(src, dst, s1)
        before = _sid(dst)
        ci = replicate_incremental(src, dst, s1)
        assert ci.rows_written == 0 and _sid(dst) == before
