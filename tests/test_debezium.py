"""Debezium envelope decode (sources/debezium.py): both envelope
shapes, op mapping incl. snapshot reads, delete images from `before`,
lsn fallback, rescue routing for malformed messages — all JVM-side."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from neosync_spark.sources.debezium import decode_debezium

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _env(op, image, lsn=None, ts_ms=1000, wrap=True, before=None):
    inner = {
        "before": before,
        "after": image if op != "d" else None,
        "op": op,
        "ts_ms": ts_ms,
        "source": {"lsn": lsn, "ts_ms": ts_ms},
    }
    if op == "d":
        inner["before"] = image
    return json.dumps({"payload": inner} if wrap else inner)


def test_decode_both_shapes_and_op_mapping(spark):
    rows = [
        (_env("c", {"id": 1, "v": "a"}, lsn=10, wrap=True),),
        (_env("r", {"id": 2, "v": "b"}, lsn=11, wrap=False),),
        (_env("u", {"id": 1, "v": "a2"}, lsn=12, wrap=False),),
        (_env("d", {"id": 2, "v": "b"}, lsn=13, wrap=True),),
    ]
    df = spark.createDataFrame(rows, "value string")
    events, rescue = decode_debezium(df, SCHEMA)
    got = {r["lsn"]: (r["op"], r["id"], r["v"]) for r in events.collect()}
    assert got == {
        10: ("insert", 1, "a"),
        11: ("insert", 2, "b"),
        12: ("update", 1, "a2"),
        13: ("delete", 2, "b"),  # image from `before`
    }
    assert rescue.count() == 0


def test_lsn_falls_back_to_ts_ms(spark):
    df = spark.createDataFrame(
        [(_env("c", {"id": 5, "v": "x"}, lsn=None, ts_ms=777),)],
        "value string",
    )
    events, _ = decode_debezium(df, SCHEMA)
    r = events.collect()[0]
    assert r["lsn"] == 777
    assert r["ts"].isoformat() == "1970-01-01T00:00:00.777000"


def test_rescue_reasons(spark):
    rows = [
        ("{definitely not json",),
        (_env("x", {"id": 1, "v": "a"}, lsn=1),),  # unknown op
        (json.dumps({"payload": {"op": "u", "before": None, "after": None,
                                 "ts_ms": 5, "source": {"lsn": 2}}}),),
        (json.dumps({"payload": {"op": "c", "after": {"id": 1, "v": "a"},
                                 "before": None, "ts_ms": None,
                                 "source": {"lsn": 3}}}),),
    ]
    df = spark.createDataFrame(rows, "value string")
    events, rescue = decode_debezium(df, SCHEMA)
    assert events.count() == 0
    reasons = sorted(r["reason"] for r in rescue.collect())
    assert reasons == [
        "missing_ts_ms",
        "null_row_image",
        "unknown_op",
        "unparseable_envelope",
    ]


def test_decode_is_jvm_only_and_feeds_merge(spark, tmp_path):
    """No Python in the decode plan; decoded batch merges through the
    ledger and LWW-resolves exactly like a native batch."""
    from neosync_spark.lakehouse import SnapshotTable

    rows = [
        (_env("c", {"id": 1, "v": "a"}, lsn=1, ts_ms=1000),),
        (_env("u", {"id": 1, "v": "a2"}, lsn=2, ts_ms=2000),),
        (_env("c", {"id": 2, "v": "b"}, lsn=3, ts_ms=1500, wrap=False),),
        (_env("d", {"id": 2, "v": "b"}, lsn=4, ts_ms=3000),),
    ]
    df = spark.createDataFrame(rows, "value string")
    events, _ = decode_debezium(df, SCHEMA)
    plan = events._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan

    schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["id"],
        order_cols=["ts"], n_buckets=2,
    )
    t.merge_cdc(events, applied_range=(0, 5), source_is_raw=True,
                lineage=False)
    final = {r["id"]: r["v"] for r in t.read().collect()}
    assert final == {1: "a2"}


def test_cli_replay_debezium_format(spark, tmp_path, capsys):
    """`run_cdc replay --format debezium`: a JSONL envelope log replays
    through the standard job path (exactly-once ledger, resume) and
    malformed envelopes land in the table's quarantine_envelope dir."""
    import json as _json

    from neosync_spark.cli import main
    from neosync_spark.lakehouse import SnapshotTable

    log_dir = tmp_path / "dbzlog"
    log_dir.mkdir()
    lines = []
    for i in range(40):
        lines.append(_env(
            "c", {"conv_id": f"c{i % 8}", "turn_idx": i % 5,
                  "role": "user", "text": f"t{i}", "tool": None},
            lsn=i, ts_ms=1000 + i, wrap=(i % 2 == 0)))
    lines.append("{broken envelope")
    (log_dir / "part0.jsonl").write_text("\n".join(lines) + "\n")

    table = str(tmp_path / "t")
    rc = main([
        "replay", "--log", str(log_dir), "--table", table,
        "--format", "debezium", "--quarantine", "--batch-size", "20",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["batches_applied"] >= 2 and out["rows_applied"] > 0

    t = SnapshotTable.load(spark, table)
    final = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    # LWW winner per (conv_id, turn_idx): the highest lsn (ts_ms grows
    # with i, so latest i wins each key)
    expect = {}
    for i in range(40):
        expect[(f"c{i % 8}", i % 5)] = f"t{i}"
    assert final == expect
    qdir = tmp_path / "t" / "metadata" / "quarantine_envelope"
    q = spark.read.parquet(str(qdir)).collect()
    assert len(q) == 1 and q[0]["reason"] == "unparseable_envelope"

    # replay again: ledger no-op
    rc2 = main([
        "replay", "--log", str(log_dir), "--table", table,
        "--format", "debezium", "--batch-size", "20",
    ])
    assert rc2 == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["batches_applied"] == 0 and out2["batches_skipped"] >= 2


# ---------------------------------------------------------------------------
# Postgres unchanged-TOAST placeholders
# ---------------------------------------------------------------------------


def _toast_env(op, after, before, lsn, ts_ms):
    return json.dumps({"payload": {
        "before": before, "after": after, "op": op, "ts_ms": ts_ms,
        "source": {"lsn": lsn, "ts_ms": ts_ms},
    }})


def test_toast_placeholder_resolution_and_demotion(spark):
    """Resolvable placeholders substitute the pre-image value and stay
    full updates; unresolvable ones demote to op='patch' with the
    column NULLed; placeholders in inserts are rescued; deletes keep
    their image (only the key matters)."""
    from neosync_spark.sources.debezium import TOAST_PLACEHOLDER as PH

    rows = [
        # resolvable: before carries the real value
        (_toast_env("u", {"id": 1, "v": PH}, {"id": 1, "v": "orig"}, 1, 1000),),
        # unresolvable: before is null entirely
        (_toast_env("u", {"id": 2, "v": PH}, None, 2, 2000),),
        # unresolvable: before also a placeholder
        (_toast_env("u", {"id": 3, "v": PH}, {"id": 3, "v": PH}, 3, 3000),),
        # clean update untouched
        (_toast_env("u", {"id": 4, "v": "new"}, {"id": 4, "v": "old"}, 4, 4000),),
        # insert carrying the sentinel is malformed -> rescue
        (_toast_env("c", {"id": 5, "v": PH}, None, 5, 5000),),
        # delete whose before image carries the sentinel is fine
        (_toast_env("d", None, {"id": 6, "v": PH}, 6, 6000),),
    ]
    df = spark.createDataFrame(rows, "value string")
    events, rescue = decode_debezium(
        df, SCHEMA, toast_placeholder=PH
    )
    got = {r["lsn"]: (r["op"], r["v"]) for r in events.collect()}
    assert got == {
        1: ("update", "orig"),
        2: ("patch", None),
        3: ("patch", None),
        4: ("update", "new"),
        6: ("delete", PH),
    }
    resc = {r["reason"] for r in rescue.collect()}
    assert resc == {"toast_placeholder_in_insert"}
    # still JVM-only
    plan = events._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan


def test_toast_decode_off_by_default(spark):
    """Without toast_placeholder the sentinel is an ordinary string."""
    from neosync_spark.sources.debezium import TOAST_PLACEHOLDER as PH

    df = spark.createDataFrame(
        [(_toast_env("u", {"id": 1, "v": PH}, None, 1, 1000),)],
        "value string",
    )
    events, rescue = decode_debezium(df, SCHEMA)
    r = events.collect()[0]
    assert (r["op"], r["v"]) == ("update", PH)
    assert rescue.count() == 0


def test_toast_patch_folds_against_table_state(spark, tmp_path):
    """End to end: a TOASTed update (text unchanged on the wire, tool
    changed) must keep the table's text and apply the tool — the
    demoted patch folds against committed state via patch_ops."""
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.sources.debezium import TOAST_PLACEHOLDER as PH

    payload = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ])
    batch1 = [(_toast_env("c", {"id": 1, "text": "big toasted text", "tool": None}, None, 1, 1000),)]
    batch2 = [
        # text TOASTed-unchanged, tool set; no usable before
        (_toast_env("u", {"id": 1, "text": PH, "tool": "web"}, None, 2, 2000),),
        # a later full update of text only (tool genuinely NULL on a
        # FULL image sets NULL)
        (_toast_env("u", {"id": 1, "text": PH, "tool": "calc"}, None, 3, 3000),),
    ]
    schema = T.StructType(
        list(payload.fields) + [T.StructField("ts", T.TimestampType())]
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["id"], n_buckets=2
    )
    for i, b in enumerate([batch1, batch2]):
        df = spark.createDataFrame(b, "value string")
        ev, resc = decode_debezium(df, payload, toast_placeholder=PH)
        assert resc.count() == 0
        t.merge_cdc(ev, applied_range=(i, i + 1), source_is_raw=True,
                    patch_ops=True, lineage=False)
    final = t.read().select("id", "text", "tool").collect()
    assert [(r["id"], r["text"], r["tool"]) for r in final] == [
        (1, "big toasted text", "calc")
    ]


def test_toast_requires_patch_ops_in_plans(spark, tmp_path):
    """Job plan and streaming tail refuse toast handling without
    patch_ops — a demoted patch through a non-patch merge would
    NULL-overwrite the unchanged column."""
    import pytest

    from neosync_spark.engine import EngineConfig, ReplayEngine
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.plans.job import JobSpec, run_job
    from neosync_spark.schema import transcript_schema
    from neosync_spark.streaming.stream import StreamingReplay

    job = JobSpec(
        source_path=str(tmp_path / "log"),
        destination_path=str(tmp_path / "t"),
        source_format="debezium",
        toast_placeholder="__debezium_unavailable_value",
    )
    with pytest.raises(ValueError, match="patch_ops"):
        run_job(spark, job)

    t = SnapshotTable.create(
        spark, str(tmp_path / "t2"), transcript_schema(),
        key_cols=["conv_id", "turn_idx"], n_buckets=2,
    )
    eng = ReplayEngine(spark, t, config=EngineConfig(patch_ops=False))
    with pytest.raises(ValueError, match="patch_ops"):
        StreamingReplay(eng).start(
            str(tmp_path / "log"), str(tmp_path / "cp"),
            fmt="debezium",
            toast_placeholder="__debezium_unavailable_value",
        )


def test_kafka_tombstones_rescue_and_drop(spark):
    """A wholly-NULL value is the Kafka log-compaction tombstone
    Debezium emits after each delete — classified under its own
    reason (distinguishable from garbage), droppable as consumer
    hygiene; genuine garbage stays unparseable_envelope."""
    rows = [
        (_env("c", {"id": 1, "v": "a"}, lsn=1, ts_ms=1000),),
        (None,),
        ("{never valid json",),
    ]
    df = spark.createDataFrame(rows, "value string")
    events, rescue = decode_debezium(df, SCHEMA)
    assert events.count() == 1
    reasons = sorted(r["reason"] for r in rescue.collect())
    assert reasons == ["kafka_tombstone", "unparseable_envelope"]

    _, rescue_d = decode_debezium(df, SCHEMA, kafka_tombstones="drop")
    assert [r["reason"] for r in rescue_d.collect()] == [
        "unparseable_envelope"
    ]

    import pytest

    with pytest.raises(ValueError, match="kafka_tombstones"):
        decode_debezium(df, SCHEMA, kafka_tombstones="bogus")


def test_log_source_jsonl_tombstone_lines(spark, tmp_path):
    """A JSONL Kafka-topic dump records tombstones as empty lines or a
    literal `null` — the text source normalizes them to NULL values so
    they classify as kafka_tombstone, not unparseable garbage."""
    from neosync_spark.sources.debezium import DebeziumLogSource

    p = tmp_path / "feed"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        _env("c", {"id": 1, "v": "a"}, lsn=1, ts_ms=1000)
        + "\n\nnull\n"
    )
    src = DebeziumLogSource(spark, str(p), SCHEMA)
    assert src.events.count() == 1
    assert sorted(r["reason"] for r in src.rescue.collect()) == [
        "kafka_tombstone", "kafka_tombstone",
    ]
    src_d = DebeziumLogSource(
        spark, str(p), SCHEMA, kafka_tombstones="drop"
    )
    assert src_d.rescue.count() == 0
