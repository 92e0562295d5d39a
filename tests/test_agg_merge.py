"""Aggregate merge — counter tables as a CDC consumer (agg_merge.py)."""
from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.agg_merge import merge_agg

AGG_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("chars", T.LongType(), True),
        T.StructField("first_lsn", T.LongType(), True),
        T.StructField("last_lsn", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),  # sync ordinal
    ]
)
RESOLVERS = {
    "n_events": "sum", "chars": "sum",
    "first_lsn": "min", "last_lsn": "max",
}


def _mk(spark):
    return SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="ns_agg_"),
        AGG_SCHEMA, key_cols=["conv_id"], n_buckets=4,
    )


def _inc(spark, rows, op=None):
    df = spark.createDataFrame(
        rows, "conv_id string, n_events long, chars long, "
              "first_lsn long, last_lsn long, lsn long",
    )
    return df.withColumn("op", F.lit(op)) if op else df


def _state(t):
    return {
        r["conv_id"]: (r["n_events"], r["chars"], r["first_lsn"], r["last_lsn"])
        for r in t.read().collect()
    }


class TestAggMerge:
    def test_sum_min_max_across_batches(self, spark):
        t = _mk(spark)
        merge_agg(t, _inc(spark, [
            ("c-1", 1, 5, 1, 1, 1),
            ("c-1", 1, 7, 2, 2, 2),
            ("c-2", 1, 3, 3, 3, 3),
        ]), RESOLVERS, applied_range=(0, 4))
        merge_agg(t, _inc(spark, [
            ("c-1", 1, 10, 9, 9, 9),
        ]), RESOLVERS, applied_range=(4, 10))
        assert _state(t) == {
            "c-1": (3, 22, 1, 9),
            "c-2": (1, 3, 3, 3),
        }

    def test_replay_is_noop_despite_nonidempotent_sum(self, spark):
        t = _mk(spark)
        batch = _inc(spark, [("c-1", 1, 5, 1, 1, 1)])
        merge_agg(t, batch, RESOLVERS, applied_range=(0, 2))
        ci = merge_agg(t, batch, RESOLVERS, applied_range=(0, 2))
        assert ci.rows_written == 0
        assert _state(t)["c-1"] == (1, 5, 1, 1)

    def test_delete_resets_then_reaccumulates(self, spark):
        t = _mk(spark)
        merge_agg(t, _inc(spark, [("c-1", 5, 50, 1, 5, 5)]),
                  RESOLVERS, applied_range=(0, 6))
        # same commit: delete + fresh increments -> re-accumulate from 0
        rows = [("c-1", None, None, None, None, 10, "delete"),
                ("c-1", 1, 4, 11, 11, 11, "incr")]
        df = spark.createDataFrame(
            rows, "conv_id string, n_events long, chars long, "
                  "first_lsn long, last_lsn long, lsn long, op string",
        )
        merge_agg(t, df, RESOLVERS, applied_range=(10, 12))
        assert _state(t)["c-1"] == (1, 4, 11, 11)

    def test_delete_without_increments_drops_key(self, spark):
        t = _mk(spark)
        merge_agg(t, _inc(spark, [("c-1", 1, 5, 1, 1, 1)]),
                  RESOLVERS, applied_range=(0, 2))
        df = spark.createDataFrame(
            [("c-1", None, None, None, None, 10, "delete")],
            "conv_id string, n_events long, chars long, "
            "first_lsn long, last_lsn long, lsn long, op string",
        )
        merge_agg(t, df, RESOLVERS, applied_range=(10, 11))
        assert "c-1" not in _state(t)
        # a later increment re-creates from zero (counter-store contract)
        merge_agg(t, _inc(spark, [("c-1", 1, 2, 20, 20, 20)]),
                  RESOLVERS, applied_range=(20, 21))
        assert _state(t)["c-1"] == (1, 2, 20, 20)

    def test_uncovered_accumulator_column_rejected(self, spark):
        t = _mk(spark)
        with pytest.raises(ValueError, match="resolver"):
            merge_agg(t, _inc(spark, [("c-1", 1, 5, 1, 1, 1)]),
                      {"n_events": "sum"}, applied_range=(0, 2))

    def test_batch_order_does_not_matter_for_totals(self, spark):
        rows = [("c-%d" % (i % 3), 1, i, i, i, i) for i in range(1, 31)]
        a, b = rows[:15], rows[15:]
        t1, t2 = _mk(spark), _mk(spark)
        merge_agg(t1, _inc(spark, a), RESOLVERS, applied_range=(0, 16))
        merge_agg(t1, _inc(spark, b), RESOLVERS, applied_range=(16, 31))
        merge_agg(t2, _inc(spark, b), RESOLVERS, applied_range=(16, 31))
        merge_agg(t2, _inc(spark, a), RESOLVERS, applied_range=(0, 16))
        assert _state(t1) == _state(t2)


class TestApproxDistinct:
    """HLL sketch accumulators: the batch column carries RAW values,
    the table column a Datasketches HLL binary folded by hll_union."""

    SCHEMA = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("users", T.BinaryType(), True),
            T.StructField("n_events", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    RES = {"users": "approx_distinct", "n_events": "sum"}

    def _mk(self, spark):
        return SnapshotTable.create(
            spark, tempfile.mkdtemp(prefix="ns_agg_hll_"),
            self.SCHEMA, key_cols=["conv_id"], n_buckets=4,
        )

    def _inc(self, spark, rows, op=None):
        df = spark.createDataFrame(
            rows, "conv_id string, users string, n_events long, lsn long"
        )
        return df.withColumn("op", F.lit(op)) if op else df

    def _est(self, t):
        return {
            r["conv_id"]: (r["e"], r["n_events"])
            for r in t.read().select(
                "conv_id",
                F.hll_sketch_estimate("users").cast("long").alias("e"),
                "n_events",
            ).collect()
        }

    def test_union_across_batches_counts_distinct(self, spark):
        t = self._mk(spark)
        merge_agg(t, self._inc(spark, [
            ("c-1", "u1", 1, 1), ("c-1", "u2", 1, 2), ("c-2", "u1", 1, 3),
        ]), self.RES, applied_range=(0, 3))
        # u2 repeats across batches: distinct must not double-count
        merge_agg(t, self._inc(spark, [
            ("c-1", "u2", 1, 4), ("c-1", "u3", 1, 5), ("c-2", "u1", 1, 6),
        ]), self.RES, applied_range=(3, 6))
        assert self._est(t) == {"c-1": (3, 4), "c-2": (1, 2)}

    def test_replay_noop_keeps_estimates(self, spark):
        t = self._mk(spark)
        b = self._inc(spark, [("c-1", "u1", 1, 1), ("c-1", "u2", 1, 2)])
        merge_agg(t, b, self.RES, applied_range=(0, 2))
        merge_agg(t, b, self.RES, applied_range=(0, 2))  # replayed
        assert self._est(t) == {"c-1": (2, 2)}

    def test_delete_resets_sketch(self, spark):
        t = self._mk(spark)
        merge_agg(t, self._inc(spark, [
            ("c-1", "u1", 1, 1), ("c-1", "u2", 1, 2),
        ]), self.RES, applied_range=(0, 2))
        rows = [("c-1", "u9", 1, 3)]
        b = self._inc(spark, rows).withColumn("op", F.lit("incr")).unionByName(
            self._inc(spark, [("c-1", None, None, 4)]).withColumn(
                "op", F.lit("delete")
            )
        )
        merge_agg(t, b, self.RES, applied_range=(2, 4))
        # reset-then-reaccumulate: only u9 counted after the delete
        assert self._est(t) == {"c-1": (1, 1)}

    def test_estimate_accuracy_at_scale(self, spark):
        t = self._mk(spark)
        n = 20000
        batch = spark.range(n).select(
            F.lit("c-1").alias("conv_id"),
            F.concat(F.lit("user-"), F.col("id")).alias("users"),
            F.lit(1).cast("long").alias("n_events"),
            F.col("id").alias("lsn"),
        )
        merge_agg(t, batch, self.RES, applied_range=(0, n))
        est = self._est(t)["c-1"][0]
        assert abs(est - n) / n < 0.05
