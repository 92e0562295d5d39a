"""Wire-schema drift on a Debezium feed: a producer that adds a payload
column mid-stream keeps parsing cleanly while ``from_json`` silently
drops the new field. ``infer_payload_evolution`` detects the drift from
the envelopes themselves (one narrow key aggregation per epoch) and the
streaming tail evolves the destination additively before decoding —
the first epoch carrying a column also lands it."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.sources.debezium import infer_payload_evolution

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


def _df(spark, lines):
    return spark.createDataFrame([(x,) for x in lines], "value string")


class TestInferPayloadEvolution:
    def test_no_drift_returns_none(self, spark):
        lines = [
            _env("c", {"id": 1, "v": "a"}, 1, 1000),
            _env("u", {"id": 1, "v": "b"}, 2, 2000, wrap=False),
        ]
        widened, new = infer_payload_evolution(_df(spark, lines), SCHEMA)
        assert widened is None and new == []

    def test_new_fields_typed_from_sampled_json(self, spark):
        img = {
            "id": 1,
            "v": "a",
            "rating": 7,
            "score": 0.5,
            "flag": True,
            "note": "42",  # quoted => stays a string
            "meta": {"k": [1, 2]},  # nested => raw-JSON string column
            "nul": None,  # never non-null => string default
        }
        lines = [_env("c", img, 1, 1000), _env("c", {"id": 2, "v": "b"}, 2, 1000)]
        widened, new = infer_payload_evolution(_df(spark, lines), SCHEMA)
        got = {f.name: f.dataType for f in new}
        assert got == {
            "rating": T.LongType(),
            "score": T.DoubleType(),
            "flag": T.BooleanType(),
            "note": T.StringType(),
            "meta": T.StringType(),
            "nul": T.StringType(),
        }
        # appended after the existing fields, existing order untouched
        assert [f.name for f in widened.fields][:2] == ["id", "v"]

    def test_key_only_in_delete_before_image(self, spark):
        lines = [
            _env("d", {"id": 1, "v": "a", "ghost": 3}, 5, 1000),
        ]
        _, new = infer_payload_evolution(_df(spark, lines), SCHEMA)
        assert [(f.name, f.dataType) for f in new] == [
            ("ghost", T.LongType())
        ]

    def test_malformed_envelopes_contribute_nothing(self, spark):
        lines = ["{garbage", _env("c", {"id": 1, "v": "a"}, 1, 1000)]
        widened, new = infer_payload_evolution(_df(spark, lines), SCHEMA)
        assert widened is None and new == []


class TestStrictWireTypes:
    """Type drift: a token that doesn't fit the declared field type is
    silently nulled by PERMISSIVE from_json — strict_types rescues the
    row instead."""

    SCHEMA3 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )

    def _decode(self, spark, lines, strict):
        from neosync_spark.sources.debezium import decode_debezium

        ev, rs = decode_debezium(
            _df(spark, lines), self.SCHEMA3, strict_types=strict
        )
        return ev.collect(), rs.collect()

    def test_conflict_rescued_with_field_names(self, spark):
        lines = [
            _env("c", {"id": "abc", "n": 1, "v": "a"}, 1, 1000),
            _env("c", {"id": 2, "n": 2, "v": "b"}, 2, 1000),
            _env("c", {"id": "x", "n": True, "v": "c"}, 3, 1000),
        ]
        ev, rs = self._decode(spark, lines, strict=True)
        assert [r["id"] for r in ev] == [2]
        reasons = sorted(r["reason"] for r in rs)
        assert reasons == ["type_conflict:id", "type_conflict:id,n"]

    def test_permissive_default_nulls_silently(self, spark):
        # the trap strict_types exists for, pinned as documented default
        lines = [_env("c", {"id": "abc", "n": 1, "v": "a"}, 1, 1000)]
        ev, rs = self._decode(spark, lines, strict=False)
        assert rs == [] and ev[0]["id"] is None and ev[0]["n"] == 1

    def test_json_null_and_missing_key_are_not_conflicts(self, spark):
        lines = [
            _env("c", {"id": None, "n": 7, "v": "a"}, 1, 1000),
            _env("c", {"n": 8, "v": "b"}, 2, 1000),
        ]
        ev, rs = self._decode(spark, lines, strict=True)
        assert rs == []
        assert sorted(r["n"] for r in ev) == [7, 8]

    def test_string_fields_never_conflict(self, spark):
        # any token captures into a declared string (raw-JSON for
        # nested) — numbers/objects in v are fine
        lines = [
            _env("c", {"id": 1, "n": 1, "v": 42}, 1, 1000),
            _env("c", {"id": 2, "n": 2, "v": {"x": 1}}, 2, 1000),
        ]
        ev, rs = self._decode(spark, lines, strict=True)
        assert rs == []
        assert sorted(r["v"] for r in ev) == ["42", '{"x":1}']

    def test_job_path_quarantines_conflicts(self, spark, tmp_path):
        from neosync_spark.plans.job import JobSpec, run_job

        log_dir = tmp_path / "feed3"
        log_dir.mkdir()
        lines = [
            _env("c", {"id": 1, "v": "a"}, 1, 1000),
            _env("c", {"id": "drifted", "v": "bad"}, 2, 2000),
        ]
        (log_dir / "seg-0.jsonl").write_text("\n".join(lines) + "\n")
        table_schema = T.StructType(
            list(SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
        )
        SnapshotTable.create(
            spark, str(tmp_path / "t_strict"), table_schema,
            key_cols=["id"], order_cols=["ts"], n_buckets=2,
        )
        job = JobSpec(
            source_path=str(log_dir),
            destination_path=str(tmp_path / "t_strict"),
            source_format="debezium",
            envelope_schema="id bigint, v string",
            strict_wire_types=True,
            quarantine=True,
        )
        run_job(spark, job)
        t = SnapshotTable.load(spark, str(tmp_path / "t_strict"))
        assert {r["id"] for r in t.read().collect()} == {1}
        q = spark.read.parquet(
            str(tmp_path / "t_strict" / "metadata" / "quarantine_envelope")
        ).collect()
        assert [r["reason"] for r in q] == ["type_conflict:id"]
        assert "drifted" in q[0]["value"]


def _write_feed(log_dir):
    """Epoch 0: base payload. Epoch 1: the producer added `rating`
    (long) and `meta` (nested object). Distinct mtimes pin the file
    stream's epoch order."""
    log_dir.mkdir()
    f0 = [
        _env("c", {"id": 1, "v": "a"}, 1, 1000),
        _env("c", {"id": 2, "v": "b"}, 2, 1000, wrap=False),
    ]
    f1 = [
        _env("u", {"id": 1, "v": "a2", "rating": 9, "meta": {"x": 1}}, 3, 2000),
        _env("c", {"id": 3, "v": "c", "rating": 4, "meta": None}, 4, 2000),
    ]
    for i, lines in enumerate([f0, f1]):
        p = log_dir / f"seg-{i}.jsonl"
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _tail(spark, tmp_path, log_dir, name, evolve):
    from neosync_spark.engine import EngineConfig, ReplayEngine
    from neosync_spark.streaming.stream import StreamingReplay

    table_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / name), table_schema, key_cols=["id"],
        order_cols=["ts"], n_buckets=2,
    )
    eng = ReplayEngine(spark, t, config=EngineConfig(lineage=False))
    q = StreamingReplay(eng).start(
        str(log_dir), str(tmp_path / f"ckpt_{name}"),
        max_files_per_trigger=1, fmt="debezium", payload_schema=SCHEMA,
        evolve_payload=evolve,
    )
    assert q.awaitTermination(180)
    return t


def test_streaming_tail_evolves_payload(spark, tmp_path):
    log_dir = tmp_path / "feed"
    _write_feed(log_dir)
    t = _tail(spark, tmp_path, log_dir, "t_evolve", evolve=True)

    cols = {f.name: f.dataType for f in t.current_schema().fields}
    assert cols["rating"] == T.LongType()
    assert cols["meta"] == T.StringType()
    rows = {r["id"]: r for r in t.read().collect()}
    assert set(rows) == {1, 2, 3}
    # epoch-1 rows carry the new columns from their very first epoch
    assert rows[1]["v"] == "a2" and rows[1]["rating"] == 9
    assert json.loads(rows[1]["meta"]) == {"x": 1}
    assert rows[3]["rating"] == 4 and rows[3]["meta"] is None
    # pre-drift row: evolved columns backfill as NULL
    assert rows[2]["rating"] is None and rows[2]["meta"] is None
    assert len(t.applied_ranges()) == 2


def test_batch_replay_evolves_payload(spark, tmp_path):
    """Same drift through the BATCH job path: `replay --format debezium
    --evolve-payload` — one inference pass over the whole feed, table
    evolved before any data moves, full replay lands the column."""
    from neosync_spark.plans.job import JobSpec, run_job

    log_dir = tmp_path / "feed"
    _write_feed(log_dir)
    table_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("ts", T.TimestampType())]
    )
    SnapshotTable.create(
        spark, str(tmp_path / "t_batch"), table_schema, key_cols=["id"],
        order_cols=["ts"], n_buckets=2,
    )
    job = JobSpec(
        source_path=str(log_dir),
        destination_path=str(tmp_path / "t_batch"),
        source_format="debezium",
        envelope_schema="id bigint, v string",
        evolve_payload=True,
    )
    run_job(spark, job)
    t = SnapshotTable.load(spark, str(tmp_path / "t_batch"))
    cols = {f.name: f.dataType for f in t.current_schema().fields}
    assert cols["rating"] == T.LongType()
    assert cols["meta"] == T.StringType()
    rows = {r["id"]: r for r in t.read().collect()}
    assert rows[1]["v"] == "a2" and rows[1]["rating"] == 9
    assert json.loads(rows[1]["meta"]) == {"x": 1}
    assert rows[2]["rating"] is None
    # rerun: exactly-once ledger no-op, state unchanged
    stats = run_job(spark, job)
    assert stats.batches_applied == 0
    assert {r["id"]: r["rating"] for r in t.read().collect()} == {
        1: 9, 2: None, 3: 4,
    }


def test_streaming_tail_drops_drift_by_default(spark, tmp_path):
    log_dir = tmp_path / "feed"
    _write_feed(log_dir)
    t = _tail(spark, tmp_path, log_dir, "t_fixed", evolve=False)
    names = {f.name for f in t.current_schema().fields}
    assert "rating" not in names and "meta" not in names
    rows = {r["id"]: r["v"] for r in t.read().collect()}
    assert rows == {1: "a2", 2: "b", 3: "c"}
