"""Incremental join-view maintenance (operators/join_view.py)."""
from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.join_view import (
    default_project,
    incremental_join_sync,
)
from neosync_spark.schema import KEY_COLS, transcript_schema


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk(spark, schema=None, keys=KEY_COLS):
    path = tempfile.mkdtemp(prefix="ns_jv_")
    return SnapshotTable.create(
        spark, path, schema or transcript_schema(), key_cols=keys,
        n_buckets=4,
    )


VIEW_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("src_ts", T.TimestampType(), True),
        T.StructField("dim_role", T.StringType(), True),
        T.StructField("dim_text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),  # sync ordinal
    ]
)


def _project(left, right):
    dim = (
        right.filter(F.col("turn_idx") == 0)
        .select(
            "conv_id",
            F.col("role").alias("dim_role"),
            F.col("text").alias("dim_text"),
        )
    )
    return left.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.col("ts").alias("src_ts"),
    ).join(dim, "conv_id", "left")


def _full_view(spark, left, right):
    return sorted(
        tuple(r)
        for r in _project(left.read(), right.read())
        .select("conv_id", "turn_idx", "text", "dim_text")
        .collect()
    )


def _view_state(dst):
    return sorted(
        tuple(r)
        for r in dst.read()
        .select("conv_id", "turn_idx", "text", "dim_text")
        .collect()
    )


@pytest.fixture()
def tables(spark):
    left = _mk(spark)
    right = _mk(spark)
    dst = _mk(spark, VIEW_SCHEMA)
    left.merge_cdc(
        _ev(spark, [
            ("c-1", 0, "user", "hello", None, 1000.0, 1, "insert"),
            ("c-1", 1, "assistant", "hi", None, 1001.0, 2, "insert"),
            ("c-2", 0, "user", "yo", None, 1002.0, 3, "insert"),
            ("c-2", 1, "assistant", "hey", None, 1003.0, 4, "insert"),
        ]),
        applied_range=(0, 5), source_is_raw=True,
    )
    right.merge_cdc(
        _ev(spark, [
            ("c-1", 0, "meta", "dim-one", None, 1000.0, 1, "insert"),
            ("c-2", 0, "meta", "dim-two", None, 1001.0, 2, "insert"),
        ]),
        applied_range=(0, 3), source_is_raw=True,
    )
    return left, right, dst


def _sids(t):
    return t.manifest(refresh=True)["snapshot_id"]


class TestJoinView:
    def test_initial_build(self, spark, tables):
        left, right, dst = tables
        incremental_join_sync(
            left, right, dst, _sids(left), _sids(right), project=_project
        )
        assert _view_state(dst) == _full_view(spark, left, right)

    def test_left_change_and_delete(self, spark, tables):
        left, right, dst = tables
        sl0, sr0 = _sids(left), _sids(right)
        incremental_join_sync(left, right, dst, sl0, sr0, project=_project)
        left.merge_cdc(
            _ev(spark, [
                ("c-1", 1, "assistant", "hi-v2", None, 2000.0, 10, "update"),
                ("c-2", 1, None, None, None, 2001.0, 11, "delete"),
            ]),
            applied_range=(10, 12), source_is_raw=True,
        )
        incremental_join_sync(
            left, right, dst, _sids(left), sr0,
            from_left=sl0, from_right=sr0, project=_project,
        )
        assert _view_state(dst) == _full_view(spark, left, right)
        texts = {r[2] for r in _view_state(dst)}
        assert "hi-v2" in texts and "hey" not in texts

    def test_right_change_fans_out(self, spark, tables):
        left, right, dst = tables
        sl0, sr0 = _sids(left), _sids(right)
        incremental_join_sync(left, right, dst, sl0, sr0, project=_project)
        right.merge_cdc(
            _ev(spark, [
                ("c-1", 0, "meta", "dim-one-v2", None, 3000.0, 20, "update"),
            ]),
            applied_range=(20, 21), source_is_raw=True,
        )
        incremental_join_sync(
            left, right, dst, sl0, _sids(right),
            from_left=sl0, from_right=sr0, project=_project,
        )
        got = _view_state(dst)
        assert got == _full_view(spark, left, right)
        # BOTH c-1 turns re-projected to the new dimension value
        assert sum(1 for r in got if r[3] == "dim-one-v2") == 2

    def test_right_delete_nulls_dimension(self, spark, tables):
        left, right, dst = tables
        sl0, sr0 = _sids(left), _sids(right)
        incremental_join_sync(left, right, dst, sl0, sr0, project=_project)
        right.merge_cdc(
            _ev(spark, [
                ("c-2", 0, None, None, None, 3000.0, 30, "delete"),
            ]),
            applied_range=(30, 31), source_is_raw=True,
        )
        incremental_join_sync(
            left, right, dst, sl0, _sids(right),
            from_left=sl0, from_right=sr0, project=_project,
        )
        got = _view_state(dst)
        assert got == _full_view(spark, left, right)
        assert all(r[3] is None for r in got if r[0] == "c-2")

    def test_rerun_is_noop(self, spark, tables):
        left, right, dst = tables
        sl0, sr0 = _sids(left), _sids(right)
        incremental_join_sync(left, right, dst, sl0, sr0, project=_project)
        left.merge_cdc(
            _ev(spark, [
                ("c-1", 0, "user", "hello-v2", None, 2000.0, 10, "update"),
            ]),
            applied_range=(10, 11), source_is_raw=True,
        )
        args = dict(
            from_left=sl0, from_right=sr0, project=_project,
        )
        incremental_join_sync(
            left, right, dst, _sids(left), sr0, **args
        )
        before = _sids(dst)
        ci = incremental_join_sync(
            left, right, dst, _sids(left), sr0, **args
        )
        assert ci.rows_written == 0
        assert _sids(dst) == before
        assert _view_state(dst) == _full_view(spark, left, right)

    def test_project_must_not_emit_ordinal(self, spark, tables):
        left, right, dst = tables

        def bad(l, r):  # noqa: E741
            return _project(l, r).withColumn("ts", F.lit(None))

        with pytest.raises(ValueError, match="ordinal"):
            incremental_join_sync(
                left, right, dst, _sids(left), _sids(right), project=bad
            )

    def test_default_project_prefixes(self, spark, tables):
        left, right, _ = tables
        df = default_project("conv_id")(left.read(), right.read())
        assert "dim_text" in df.columns and "dim_role" in df.columns
