"""Debezium envelope ENCODER (sources/debezium.encode_debezium /
snapshot_export_debezium): the table as a CDC producer. The decode
path is covered by test_debezium.py; here the loop closes — envelopes
produced from snapshot_diff replay through decode_debezium + merge_cdc
into a replica that must equal the primary."""
from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.plans.replicate import replica_schema
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.sources.debezium import (
    decode_debezium,
    encode_debezium,
    snapshot_export_debezium,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk(spark, schema=None):
    return SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="ns_dbzx_"),
        schema or transcript_schema(), key_cols=KEY_COLS, n_buckets=4,
    )


def _payload():
    return T.StructType(
        [f for f in replica_schema(transcript_schema()).fields
         if f.name != "ts"]
    )


def _setup(spark):
    t = _mk(spark)
    t.merge_cdc(
        _ev(spark, [
            ("a", 0, "user", "x", "t1", 1.0, 1, "insert"),
            ("b", 0, "user", "y", None, 1.0, 2, "insert"),
        ]),
        applied_range=(0, 2),
    )
    s1 = t.manifest(refresh=True)["snapshot_id"]
    t.merge_cdc(
        _ev(spark, [
            ("a", 0, "user", "x2", "t1", 2.0, 3, "update"),
            ("b", 0, None, None, None, 2.0, 4, "delete"),
            ("c", 0, "user", "z", None, 2.0, 5, "insert"),
        ]),
        applied_range=(2, 5),
    )
    s2 = t.manifest(refresh=True)["snapshot_id"]
    return t, s1, s2


def test_envelope_shapes(spark):
    t, s1, s2 = _setup(spark)
    hop = encode_debezium(
        t.snapshot_diff(s1, s2, include_preimages=True), KEY_COLS, s2
    )
    envs = {json.loads(r.value)["op"]: json.loads(r.value)
            for r in hop.collect()}
    assert set(envs) == {"c", "u", "d"}
    # update carries BOTH images (the pre/post pair pivoted into one)
    assert envs["u"]["before"]["text"] == "x"
    assert envs["u"]["after"]["text"] == "x2"
    # insert: after only; delete: before only (absent == null)
    assert envs["c"]["after"]["text"] == "z" and "before" not in envs["c"]
    assert envs["d"]["before"]["text"] == "y" and "after" not in envs["d"]
    # event time rides INSIDE the image; envelope meta carries the hop
    assert envs["u"]["after"]["src_ts"].startswith("1970-01-01T00:00:02")
    assert all(e["ts_ms"] == s2 * 1000 for e in envs.values())
    assert all(e["source"]["lsn"] == s2 for e in envs.values())
    # the Kafka key is the key-column JSON
    keys = {json.loads(r.key)["conv_id"] for r in hop.collect()}
    assert keys == {"a", "b", "c"}


def test_bootstrap_export_is_r_ops(spark):
    t, s1, _ = _setup(spark)
    boot = snapshot_export_debezium(t, s1)
    envs = [json.loads(r.value) for r in boot.collect()]
    assert len(envs) == 2
    assert all(e["op"] == "r" and "before" not in e for e in envs)
    assert {e["after"]["conv_id"] for e in envs} == {"a", "b"}


def test_roundtrip_replica_equals_primary(spark):
    t, s1, s2 = _setup(spark)
    payload = _payload()
    rep = _mk(spark, replica_schema(transcript_schema()))
    boot = snapshot_export_debezium(t, s1).select("value")
    e1, r1 = decode_debezium(boot, payload)
    rep.merge_cdc(e1, applied_range=(0, s1), source_is_raw=True)
    hop = encode_debezium(
        t.snapshot_diff(s1, s2, include_preimages=True), KEY_COLS, s2
    ).select("value")
    e2, r2 = decode_debezium(hop, payload)
    rep.merge_cdc(e2, applied_range=(s1, s2), source_is_raw=True)
    assert r1.count() == 0 and r2.count() == 0
    got = sorted(
        tuple(r) for r in rep.read().select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.date_format("src_ts", "HH:mm:ss"),
        ).collect()
    )
    want = sorted(
        tuple(r) for r in t.read().select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.date_format("ts", "HH:mm:ss"),
        ).collect()
    )
    assert got == want
    # hop replay through the ledger is a no-op
    info = rep.merge_cdc(e2, applied_range=(s1, s2), source_is_raw=True)
    assert info.rows_written == 0


def test_delete_preimage_ts_cannot_reorder_consumer(spark):
    # the delete envelope carries the removed row's OLD image (src_ts
    # 9 < the bootstrap replica row's ordinal-independent payload) —
    # the consumer must order by the hop ordinal (ts_ms/source.lsn =
    # s2 > s1), never by the pre-image's event time
    t = _mk(spark)
    t.merge_cdc(
        _ev(spark, [("k", 0, "user", "new", None, 9.0, 1, "insert")]),
        applied_range=(0, 1),
    )
    s1 = t.manifest(refresh=True)["snapshot_id"]
    payload = _payload()
    rep = _mk(spark, replica_schema(transcript_schema()))
    e1, _ = decode_debezium(
        snapshot_export_debezium(t, s1).select("value"), payload
    )
    rep.merge_cdc(e1, applied_range=(0, s1), source_is_raw=True)
    t.merge_cdc(
        _ev(spark, [("k", 0, None, None, None, 10.0, 2, "delete")]),
        applied_range=(1, 2),
    )
    s2 = t.manifest(refresh=True)["snapshot_id"]
    assert t.read().count() == 0
    hop = encode_debezium(
        t.snapshot_diff(s1, s2, include_preimages=True), KEY_COLS, s2
    )
    env = json.loads(hop.collect()[0].value)
    # the pre-image's event time (9s) rides as payload, NOT as the
    # consumer's LWW ordinal (which is the hop: s2)
    assert env["op"] == "d"
    assert env["before"]["src_ts"].startswith("1970-01-01T00:00:09")
    assert env["ts_ms"] == s2 * 1000
    e2, _ = decode_debezium(hop.select("value"), payload)
    rep.merge_cdc(e2, applied_range=(s1, s2), source_is_raw=True)
    assert rep.read().count() == 0
