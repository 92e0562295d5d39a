"""Debezium envelope tail as a Structured Streaming source: readStream
over envelope text files → JVM decode per micro-batch → ledgered merge;
rescue rows quarantined per epoch. Composition of sources/debezium with
the exactly-once sink path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.sources.debezium import decode_debezium

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _env(op, image, lsn, ts_ms, wrap=True):
    inner = {
        "before": image if op == "d" else None,
        "after": image if op != "d" else None,
        "op": op,
        "ts_ms": ts_ms,
        "source": {"lsn": lsn, "ts_ms": ts_ms},
    }
    return json.dumps({"payload": inner} if wrap else inner)


def test_streaming_debezium_tail(spark, tmp_path):
    log_dir = tmp_path / "envelopes"
    log_dir.mkdir()
    # three files => three micro-batches (maxFilesPerTrigger=1)
    files = [
        [
            _env("c", {"id": 1, "v": "a"}, 1, 1000),
            _env("c", {"id": 2, "v": "b"}, 2, 1000, wrap=False),
        ],
        [
            _env("u", {"id": 1, "v": "a2"}, 3, 2000),
            "{garbage envelope",
        ],
        [
            _env("d", {"id": 2, "v": "b"}, 4, 3000),
            _env("r", {"id": 3, "v": "c"}, 5, 1500, wrap=False),
        ],
    ]
    for i, lines in enumerate(files):
        (log_dir / f"f{i}.txt").write_text("\n".join(lines) + "\n")

    table_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), table_schema, key_cols=["id"],
        order_cols=["ts"], n_buckets=2,
    )
    rescued: list[tuple[str, str]] = []

    def apply_epoch(batch, epoch_id):
        events, rescue = decode_debezium(batch, SCHEMA)
        rescued.extend(
            (r["value"], r["reason"]) for r in rescue.collect()
        )
        t.merge_cdc(
            events,
            applied_range=(int(epoch_id), int(epoch_id) + 1),
            source_is_raw=True,
            lineage=False,
        )

    q = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(log_dir))
        .writeStream.foreachBatch(apply_epoch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = {r["id"]: r["v"] for r in t.read().collect()}
    assert final == {1: "a2", 3: "c"}  # 2 deleted, 1 updated, r inserted
    assert [r for _, r in rescued] == ["unparseable_envelope"]
    assert len(t.applied_ranges()) == 3


def _synth_envelopes(log, n_files):
    """Serialize a synth change log as Debezium envelope JSONL lines,
    split round-robin into n_files file payloads (lsn order within
    each file)."""
    op_map = {"insert": "c", "update": "u", "delete": "d"}
    buckets: list[list[str]] = [[] for _ in range(n_files)]
    for i, row in enumerate(log.sort_values("lsn").to_dict("records")):
        image = {
            "conv_id": row["conv_id"],
            "turn_idx": int(row["turn_idx"]),
            "role": row["role"],
            "text": row["text"],
            "tool": row["tool"] if row["tool"] is not None else None,
        }
        op = op_map[row["op"]]
        ts_ms = int(row["ts"].timestamp() * 1000)
        buckets[i % n_files].append(
            _env(op, image, int(row["lsn"]), ts_ms, wrap=bool(i % 2))
        )
    return buckets


def test_streaming_replay_debezium_fmt(spark, tmp_path):
    """First-class surface: StreamingReplay.start(fmt='debezium') tails
    envelope JSONL through the SAME ledgered apply path as the parquet
    WAL tail — final state equals the LWW oracle, malformed envelopes
    land in quarantine_envelope, and a redelivered run (fresh stream
    checkpoint, same files) is a ledger no-op."""
    import pandas as pd

    from neosync_spark.engine import EngineConfig, ReplayEngine
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.schema import KEY_COLS, transcript_schema
    from neosync_spark.streaming.stream import StreamingReplay
    from neosync_spark.synth import (
        SynthConfig,
        expected_final_state,
        generate_pandas,
    )

    from .conftest import assert_pdf_equal

    log = generate_pandas(SynthConfig(n_events=2_000, n_convs=120))
    files = _synth_envelopes(log, n_files=4)
    files[2].append('{"payload": {"op": "x"')  # malformed envelope
    log_dir = tmp_path / "envelopes"
    log_dir.mkdir()
    for i, lines in enumerate(files):
        (log_dir / f"seg-{i}.jsonl").write_text("\n".join(lines) + "\n")

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    eng = ReplayEngine(spark, table, config=EngineConfig(quarantine=True))
    q = StreamingReplay(eng).start(
        str(log_dir), str(tmp_path / "ckpt"),
        max_files_per_trigger=2, fmt="debezium",
    )
    assert q.awaitTermination(180)

    got = table.read().toPandas()
    exp = expected_final_state(log)
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])

    qdir = str(tmp_path / "t" / "metadata" / "quarantine_envelope")
    quarantined = spark.read.parquet(qdir).toPandas()
    assert set(quarantined["reason"]) == {"unparseable_envelope"}
    assert len(quarantined.drop_duplicates("value")) == 1

    # redelivery: fresh stream checkpoint, same segments, same epoch
    # grouping => identical lsn ranges => every epoch is is_applied
    n_ranges = len(table.applied_ranges())
    q2 = StreamingReplay(eng).start(
        str(log_dir), str(tmp_path / "ckpt2"),
        max_files_per_trigger=2, fmt="debezium",
    )
    assert q2.awaitTermination(180)
    assert len(table.applied_ranges()) == n_ranges
    assert_pdf_equal(table.read().toPandas(), exp, ["conv_id", "turn_idx"])
