"""Catalog: atomic multi-table publish (plans/catalog.py).

The multi-table analog of the single-table snapshot swap: readers
resolving through the catalog see either the old SET of pins or the
new one, never a mix, regardless of how far each table's own main has
advanced — with CAS single-winner semantics between publishers.
"""
from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.plans.catalog import Catalog, CatalogConflictError
from neosync_spark.schema import KEY_COLS, transcript_schema


def _events(spark, lo, hi, pfx="c"):
    rows = [
        (f"{pfx}-{i % 5}", i % 3, "user", f"t-{i}", None,
         float(1000 + i), i, "insert")
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk_table(spark):
    path = tempfile.mkdtemp(prefix="ns_cat_t_")
    return SnapshotTable.create(
        spark, path, transcript_schema(), key_cols=KEY_COLS, n_buckets=4
    )


def _mk_catalog():
    return Catalog.create(tempfile.mkdtemp(prefix="ns_cat_"))


class TestPinnedReads:
    def test_repeatable_while_main_advances(self, spark):
        t = _mk_table(spark)
        t.merge_cdc(_events(spark, 0, 30), applied_range=(0, 30),
                    source_is_raw=True)
        cat = _mk_catalog()
        cat.publish({"conv": t})
        n_pinned = cat.read(spark, "conv").count()
        # main advances past the pin
        t.merge_cdc(_events(spark, 100, 160, "new"), applied_range=(100, 160),
                    source_is_raw=True)
        assert cat.read(spark, "conv").count() == n_pinned
        assert t.read().count() > n_pinned

    def test_atomic_set_swap(self, spark):
        ta, tb = _mk_table(spark), _mk_table(spark)
        ta.merge_cdc(_events(spark, 0, 20, "a"), applied_range=(0, 20),
                     source_is_raw=True)
        tb.merge_cdc(_events(spark, 0, 20, "b"), applied_range=(0, 20),
                     source_is_raw=True)
        cat = _mk_catalog()
        v1 = cat.publish({"a": ta, "b": tb})
        ta.merge_cdc(_events(spark, 20, 40, "a"), applied_range=(20, 40),
                     source_is_raw=True)
        tb.merge_cdc(_events(spark, 20, 40, "b"), applied_range=(20, 40),
                     source_is_raw=True)
        old = cat.tables()
        v2 = cat.publish({"a": ta, "b": tb})
        assert v2 == v1 + 1
        new = cat.tables()
        # both pins moved in ONE version step — no state exists where
        # one moved and the other did not
        assert new["a"]["snapshot_id"] > old["a"]["snapshot_id"]
        assert new["b"]["snapshot_id"] > old["b"]["snapshot_id"]

    def test_cas_conflict_single_winner(self, spark):
        t = _mk_table(spark)
        t.merge_cdc(_events(spark, 0, 10), applied_range=(0, 10),
                    source_is_raw=True)
        cat = _mk_catalog()
        cat.publish({"conv": t})
        v = cat.version()
        cat.publish({"conv": t}, expected_version=v)  # winner
        with pytest.raises(CatalogConflictError):
            cat.publish({"conv": t}, expected_version=v)  # stale loser

    def test_dangling_pin_refused(self, spark):
        t = _mk_table(spark)
        cat = _mk_catalog()
        with pytest.raises(ValueError, match="dangling"):
            cat.publish({"conv": (t.path, 999)})

    def test_bare_sid_requires_registration(self, spark):
        cat = _mk_catalog()
        with pytest.raises(KeyError):
            cat.publish({"conv": 3})


class TestPublishConsistent:
    def test_aligned_watermark_pins(self, spark):
        from neosync_spark.engine import EngineConfig, ReplayEngine

        log_a = _events(spark, 0, 64, "a")
        log_b = _events(spark, 0, 64, "b")
        ta, tb = _mk_table(spark), _mk_table(spark)
        # different commit grids with a common multiple (16 and 32)
        for t, log, bs in ((ta, log_a, 16), (tb, log_b, 32)):
            eng = ReplayEngine(
                spark, t,
                config=EngineConfig(batch_lsn_size=bs, lineage=False),
            )
            eng.replay(
                lambda lo, hi, log=log: log.filter(
                    (F.col("lsn") >= lo) & (F.col("lsn") < hi)
                ),
                lsn_lo=0, lsn_hi=63,
            )
        cat = _mk_catalog()
        _, w = cat.publish_consistent({"a": ta, "b": tb})
        # both pinned views reflect exactly lsn < w
        for name, log in (("a", log_a), ("b", log_b)):
            got = sorted(
                tuple(r) for r in
                cat.read(spark, name).select("conv_id", "turn_idx", "text")
                .collect()
            )
            want_df = log.filter(F.col("lsn") < w)
            from neosync_spark.operators.dedup import lww_dedup

            want = sorted(
                tuple(r) for r in
                lww_dedup(want_df, KEY_COLS, ["ts", "lsn"])
                .filter(F.col("op") != "delete")
                .select("conv_id", "turn_idx", "text").collect()
            )
            assert got == want, name
