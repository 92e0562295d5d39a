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
