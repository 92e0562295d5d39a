"""Transactional-outbox routing (operators/outbox.py): one outbox CDC
feed fans out to typed destination tables with per-table exactly-once
ledgers. Routing semantics follow the public Debezium
outbox-event-router contract (no reference counterpart)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.outbox import (
    OutboxRoute,
    outbox_schema,
    outbox_sync,
    route_outbox,
)

CONV = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
])
ACCT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("plan", T.StringType()),
])


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def _row(i, atype, aid, typ, payload):
    import json

    return (i, atype, aid, typ, json.dumps(payload), _ts(i), i)


def _batch(spark, rows):
    return spark.createDataFrame(rows, outbox_schema())


ROUTES = {
    "conversation": OutboxRoute(CONV, ["conv_id", "turn_idx"]),
    "account": OutboxRoute(
        ACCT, ["user_id"], op_map={"account.closed": "delete"}
    ),
}


def _tables(spark, tmp_path):
    return {
        "conversation": SnapshotTable.create(
            spark, str(tmp_path / "conv"),
            T.StructType(list(CONV.fields) + [T.StructField("ts", T.TimestampType())]),
            key_cols=["conv_id", "turn_idx"], n_buckets=2,
        ),
        "account": SnapshotTable.create(
            spark, str(tmp_path / "acct"),
            T.StructType(list(ACCT.fields) + [T.StructField("ts", T.TimestampType())]),
            key_cols=["user_id"], n_buckets=2,
        ),
    }


def test_route_and_sync_multi_type(spark, tmp_path):
    rows = [
        _row(1, "conversation", "a", "turn.added",
             {"conv_id": "a", "turn_idx": 0, "text": "hi"}),
        _row(2, "account", "7", "account.created",
             {"user_id": 7, "plan": "free"}),
        _row(3, "conversation", "a", "turn.edited",
             {"conv_id": "a", "turn_idx": 0, "text": "hi!"}),
        _row(4, "account", "7", "account.upgraded",
             {"user_id": 7, "plan": "pro"}),
        # default delete convention: type suffix '.deleted'
        _row(5, "conversation", "a", "turn.deleted",
             {"conv_id": "a", "turn_idx": 0, "text": None}),
        _row(6, "conversation", "b", "turn.added",
             {"conv_id": "b", "turn_idx": 1, "text": "solo"}),
        # op_map delete name without the suffix
        _row(7, "account", "9", "account.created",
             {"user_id": 9, "plan": "free"}),
        _row(8, "account", "9", "account.closed", {"user_id": 9}),
    ]
    tables = _tables(spark, tmp_path)
    stats = outbox_sync(
        spark, _batch(spark, rows), tables, ROUTES, lineage=False
    )
    assert stats["unrouted"] == 0
    conv = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in tables["conversation"].read().collect()}
    assert conv == {("b", 1): "solo"}  # a/0 deleted
    acct = {r["user_id"]: r["plan"]
            for r in tables["account"].read().collect()}
    assert acct == {7: "pro"}  # 9 closed


def test_exactly_once_per_table_and_crash_heal(spark, tmp_path):
    rows = [
        _row(1, "conversation", "a", "turn.added",
             {"conv_id": "a", "turn_idx": 0, "text": "hi"}),
        _row(2, "account", "7", "account.created",
             {"user_id": 7, "plan": "free"}),
    ]
    batch = _batch(spark, rows)
    tables = _tables(spark, tmp_path)
    outbox_sync(spark, batch, tables, ROUTES, lineage=False)
    # replay of the same window no-ops on BOTH ledgers
    stats2 = outbox_sync(spark, batch, tables, ROUTES, lineage=False)
    assert stats2["applied"] == {"conversation": 0, "account": 0}

    # crash between routes: simulate by applying only one route's
    # table, then running the full sync — the completed table no-ops,
    # the missing one applies
    tables2 = _tables(spark, tmp_path / "again")
    from neosync_spark.operators.outbox import route_outbox as _r

    events, _ = _r(batch, ROUTES)
    tables2["conversation"].merge_cdc(
        events["conversation"], applied_range=(1, 3),
        source_is_raw=True, lineage=False,
    )
    stats3 = outbox_sync(spark, batch, tables2, ROUTES, lineage=False)
    assert stats3["applied"]["conversation"] == 0
    assert stats3["applied"]["account"] > 0


def test_unrouted_strict_raises_lenient_counts(spark, tmp_path):
    rows = [
        _row(1, "conversation", "a", "turn.added",
             {"conv_id": "a", "turn_idx": 0, "text": "hi"}),
        _row(2, "mystery", "x", "whatever", {"k": 1}),
    ]
    batch = _batch(spark, rows)
    tables = _tables(spark, tmp_path)
    with pytest.raises(ValueError, match="mystery"):
        outbox_sync(spark, batch, tables, ROUTES, lineage=False)
    stats = outbox_sync(
        spark, batch, tables, ROUTES, strict=False, lineage=False
    )
    assert stats["unrouted"] == 1 and stats["applied"]["conversation"] > 0


def test_route_outbox_is_single_scan_shape(spark):
    """Each route's frame is a filter + one from_json over the batch —
    no Python, and the unrouted frame catches the complement."""
    rows = [
        _row(1, "conversation", "a", "turn.added",
             {"conv_id": "a", "turn_idx": 0, "text": "hi"}),
        _row(2, "account", "7", "account.created",
             {"user_id": 7, "plan": "free"}),
    ]
    events, unrouted = route_outbox(_batch(spark, rows), ROUTES)
    assert set(events) == {"conversation", "account"}
    for df in events.values():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "BatchEvalPython" not in plan
    assert events["conversation"].columns == [
        "conv_id", "turn_idx", "text", "op", "ts", "lsn"
    ]
    assert unrouted.count() == 0
