"""Incremental SFT export (operators/sft_sync.py): training data as a
CDC consumer — per epoch only changed conversations re-window, and
examples whose target turn vanished are retracted."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.conversations import sft_examples
from neosync_spark.operators.sft_sync import create_sft_export, sft_sync
from neosync_spark.schema import KEY_COLS, transcript_schema


def _mk_batch(spark, rows):
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    import datetime as dt

    def ts(i):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)

    return spark.createDataFrame(
        [
            (op, c, t, r, x, None, ts(lsn), lsn)
            for (op, c, t, r, x, lsn) in rows
        ],
        schema,
    )


@pytest.fixture()
def tables(spark, tmp_path):
    src = SnapshotTable.create(
        spark,
        str(tmp_path / "src"),
        transcript_schema(),
        key_cols=KEY_COLS,
        n_buckets=4,
    )
    exp = create_sft_export(spark, str(tmp_path / "exp"), n_buckets=4)
    return src, exp


def _export_equals_one_shot(src, exp):
    one = sft_examples(src.read(), context_budget_chars=2048)
    got = exp.read().select(
        "conv_id", "turn_idx", "n_context_turns", "context_chars",
        "context", "target",
    )
    one = one.withColumn("turn_idx", F.col("turn_idx").cast("long"))
    assert one.exceptAll(got).count() == 0
    assert got.exceptAll(one).count() == 0


def test_epoched_export_equals_one_shot_with_retraction(spark, tables):
    src, exp = tables
    # epoch 1: two convs with assistant targets
    b1 = _mk_batch(spark, [
        ("insert", "c1", 0, "user", "hi", 1),
        ("insert", "c1", 1, "assistant", "hello!", 2),
        ("insert", "c2", 0, "user", "q", 3),
        ("insert", "c2", 1, "assistant", "a", 4),
    ])
    src.merge_cdc(b1, applied_range=(0, 5), source_is_raw=True)
    h1 = int(src.manifest(refresh=True)["snapshot_id"])
    sft_sync(src, exp, h1)
    _export_equals_one_shot(src, exp)
    assert exp.read().count() == 2

    # epoch 2: c1's assistant turn DELETED (example must retract),
    # c2's target text updated, c3 appears
    b2 = _mk_batch(spark, [
        ("delete", "c1", 1, None, None, 5),
        ("update", "c2", 1, "assistant", "better answer", 6),
        ("insert", "c3", 0, "assistant", "unprompted", 7),
    ])
    src.merge_cdc(b2, applied_range=(5, 8), source_is_raw=True)
    h2 = int(src.manifest(refresh=True)["snapshot_id"])
    info = sft_sync(src, exp, h2, from_snapshot=h1)
    _export_equals_one_shot(src, exp)
    rows = {
        (r["conv_id"], r["turn_idx"]): r["target"]
        for r in exp.read().collect()
    }
    assert ("c1", 1) not in rows  # retracted
    assert rows[("c2", 1)] == "better answer"
    assert rows[("c3", 0)] == "unprompted"

    # replaying the same span is a no-op (exactly-once ledger)
    again = sft_sync(src, exp, h2, from_snapshot=h1)
    assert again.snapshot_id == info.snapshot_id


def test_role_flip_retracts_example(spark, tables):
    src, exp = tables
    b1 = _mk_batch(spark, [
        ("insert", "c1", 0, "user", "hi", 1),
        ("insert", "c1", 1, "assistant", "hello", 2),
    ])
    src.merge_cdc(b1, applied_range=(0, 3), source_is_raw=True)
    h1 = int(src.manifest(refresh=True)["snapshot_id"])
    sft_sync(src, exp, h1)
    assert exp.read().count() == 1
    # the turn is re-labeled away from assistant: no longer a target
    b2 = _mk_batch(spark, [
        ("update", "c1", 1, "tool", "hello", 3),
    ])
    src.merge_cdc(b2, applied_range=(3, 4), source_is_raw=True)
    h2 = int(src.manifest(refresh=True)["snapshot_id"])
    sft_sync(src, exp, h2, from_snapshot=h1)
    assert exp.read().count() == 0
    _export_equals_one_shot(src, exp)


def test_unchanged_conversations_are_not_rewritten(spark, tables):
    src, exp = tables
    b1 = _mk_batch(spark, [
        ("insert", "c1", 0, "assistant", "a1", 1),
        ("insert", "c2", 0, "assistant", "a2", 2),
    ])
    src.merge_cdc(b1, applied_range=(0, 3), source_is_raw=True)
    h1 = int(src.manifest(refresh=True)["snapshot_id"])
    sft_sync(src, exp, h1)
    # epoch 2 touches only c2 — c1's exported row must survive
    # untouched (same file bytes: only changed buckets rewrite)
    b2 = _mk_batch(spark, [
        ("update", "c2", 0, "assistant", "a2-v2", 3),
    ])
    src.merge_cdc(b2, applied_range=(3, 4), source_is_raw=True)
    h2 = int(src.manifest(refresh=True)["snapshot_id"])
    sft_sync(src, exp, h2, from_snapshot=h1)
    _export_equals_one_shot(src, exp)
    got = {r["conv_id"]: r["target"] for r in exp.read().collect()}
    assert got == {"c1": "a1", "c2": "a2-v2"}
