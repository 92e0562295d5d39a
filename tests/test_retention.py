"""Metadata-only retention expiry (SnapshotTable.expire_rows).

At 100 TB, "keep the last 90 days" must not rewrite the table: files
whose zone map proves max(ts) < cutoff are dropped from the manifest
without reading a byte; only straddling or raw-patch buckets fall back
to the fold-and-filter rewrite (compact(expire_rows_before)). The
final state is identical either way — the pytest below pins both the
state equality and the I/O class (dropped vs rewritten counts).
"""
from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema

CUTOFF = datetime.datetime(1970, 1, 3)  # epoch day 2 (ts 172800)


def _events(spark, lo, hi, day, op="insert", pfx="c"):
    rows = [
        (f"{pfx}-{i}", 0, "user", f"t-{i}", None,
         float(day * 86400 + (i % 1000)), i, op)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk(spark, n_buckets=4):
    path = tempfile.mkdtemp(prefix="ns_ret_")
    return SnapshotTable.create(
        spark, path, transcript_schema(), key_cols=KEY_COLS,
        n_buckets=n_buckets,
    )


class TestMetadataOnlyDrop:
    def test_whole_old_files_drop_without_rewrite(self, spark):
        t = _mk(spark)
        t.merge_cdc(_events(spark, 0, 50, 1), applied_range=(0, 50),
                    source_is_raw=True, mode="mor")
        t.merge_cdc(_events(spark, 100, 150, 2), applied_range=(100, 150),
                    source_is_raw=True, mode="mor")
        t.merge_cdc(_events(spark, 200, 250, 3), applied_range=(200, 250),
                    source_is_raw=True, mode="mor")
        rep = t.expire_rows(CUTOFF)
        assert rep["files_dropped_meta"] > 0
        assert rep["buckets_rewritten"] == 0, "time-disjoint files must not rewrite"
        assert t.read().count() == 100  # days 2 and 3 survive
        assert t.read().agg(F.min("ts")).collect()[0][0] >= CUTOFF

    def test_mixed_old_new_bucket_drops_only_old(self, spark):
        # same keys across days -> same buckets hold old AND new files;
        # no file straddles, so the old generation drops metadata-only
        # and LWW still resolves to the kept (newer) rows
        t = _mk(spark)
        t.merge_cdc(_events(spark, 0, 50, 1), applied_range=(0, 50),
                    source_is_raw=True, mode="mor")
        t.merge_cdc(_events(spark, 50, 100, 4),  # SAME conv ids, day 4
                    applied_range=(50, 100), source_is_raw=True, mode="mor")
        rep = t.expire_rows(CUTOFF)
        assert rep["files_dropped_meta"] > 0
        assert rep["buckets_rewritten"] == 0
        out = t.read()
        assert out.count() == 50
        assert out.agg(F.min("ts")).collect()[0][0] >= CUTOFF

    def test_equivalent_to_compact_path(self, spark):
        batches = [
            (_events(spark, 0, 80, 1), (0, 80)),
            (_events(spark, 80, 160, 2), (80, 160)),
            (_events(spark, 160, 240, 4), (160, 240)),
        ]
        ta, tb = _mk(spark), _mk(spark)
        for df, rng in batches:
            ta.merge_cdc(df, applied_range=rng, source_is_raw=True, mode="mor")
            tb.merge_cdc(df, applied_range=rng, source_is_raw=True, mode="mor")
        ta.expire_rows(CUTOFF)
        tb.compact(expire_rows_before=CUTOFF)
        a = sorted(tuple(r) for r in
                   ta.read().select("conv_id", "text", "ts").collect())
        b = sorted(tuple(r) for r in
                   tb.read().select("conv_id", "text", "ts").collect())
        assert a == b


class TestRewriteFallback:
    def test_straddling_files_rewrite(self, spark):
        t = _mk(spark)
        # one commit spanning days 1..3: every file straddles the cutoff
        rows = [
            (f"c-{i}", 0, "user", f"t-{i}", None,
             float((1 + i % 3) * 86400 + i), i, "insert")
            for i in range(300)
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts double, lsn long, op string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        t.merge_cdc(df, applied_range=(0, 300), source_is_raw=True)
        rep = t.expire_rows(CUTOFF)
        assert rep["files_dropped_meta"] == 0
        assert rep["files_rewritten"] > 0, "straddlers row-filter per file"
        assert rep["buckets_rewritten"] == 0, "no patch => no bucket fold"
        want = sum(1 for i in range(300) if (1 + i % 3) * 86400 + i >= 172800)
        assert t.read().count() == want

    def test_patch_bucket_falls_back_to_rewrite(self, spark):
        # raw patch deltas void per-file dropping (a sub-cutoff patch
        # can own a column of a winner folded above the cutoff)
        t = _mk(spark)
        base = _events(spark, 0, 40, 1)
        t.merge_cdc(base, applied_range=(0, 40), source_is_raw=True,
                    mode="mor")
        patches = spark.createDataFrame(
            [(f"c-{i}", 0, None, None, "tool-set", float(4 * 86400 + i),
              1000 + i, "patch") for i in range(40)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts double, lsn long, op string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        t.merge_cdc(patches, applied_range=(1000, 1040),
                    source_is_raw=True, mode="mor", patch_ops=True)
        rep = t.expire_rows(CUTOFF)
        # the base generation is wholly old BUT folds with day-4
        # patches into day-4 winners: must go through the rewrite
        assert rep["files_dropped_meta"] == 0
        assert rep["buckets_rewritten"] > 0
        out = t.read()
        assert out.count() == 40  # winners carry the patch ts (day 4)
        # text came from the sub-cutoff base image and must survive
        assert out.filter(F.col("text").isNull()).count() == 0
        assert out.filter(F.col("tool") == "tool-set").count() == 40

    def test_untouched_when_nothing_expires(self, spark):
        t = _mk(spark)
        t.merge_cdc(_events(spark, 0, 50, 5), applied_range=(0, 50),
                    source_is_raw=True, mode="mor")
        before = t.manifest(refresh=True)["snapshot_id"]
        rep = t.expire_rows(CUTOFF)
        assert rep["files_dropped_meta"] == 0
        assert rep["buckets_rewritten"] == 0
        assert rep["snapshot_ids"] == []
        assert t.manifest(refresh=True)["snapshot_id"] == before


class TestGcInterplay:
    def test_dropped_files_physically_removed_by_gc(self, spark):
        import os

        t = _mk(spark)
        t.merge_cdc(_events(spark, 0, 50, 1), applied_range=(0, 50),
                    source_is_raw=True, mode="mor")
        t.merge_cdc(_events(spark, 100, 150, 3), applied_range=(100, 150),
                    source_is_raw=True, mode="mor")
        old_paths = [
            e["path"]
            for es in t.manifest(refresh=True)["files"].values()
            for e in es
        ]
        rep = t.expire_rows(CUTOFF)
        assert rep["files_dropped_meta"] > 0
        gc = t.expire_snapshots(keep_last=1)
        assert gc["removed_files"] > 0
        live = {
            e["path"]
            for es in t.manifest(refresh=True)["files"].values()
            for e in es
        }
        for p in old_paths:
            if p not in live:
                assert not os.path.exists(p), f"dropped file survived GC: {p}"
        assert t.read().count() == 50
