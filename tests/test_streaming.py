"""Structured Streaming front-end: the stream tail must reach the same
final state as the batch replay (same merge path via foreachBatch)."""

from __future__ import annotations

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.streaming.stream import StreamingReplay
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=4_000, n_convs=200)


def test_streaming_matches_oracle(spark, tmp_path):
    # write the log as several files => several micro-batches
    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log).repartition(6)
    log_dir = str(tmp_path / "log")
    sdf.write.parquet(log_dir)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    eng = ReplayEngine(spark, table, config=EngineConfig())
    q = StreamingReplay(eng).start(
        log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(120)

    got = table.read().toPandas()
    exp = expected_final_state(log)
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])
    # multiple micro-batch commits happened
    assert len(table.applied_ranges()) >= 1


def test_streaming_no_prepass_matches_oracle(spark, tmp_path):
    """prune_buckets=False rides the n_src count as an observe()
    metric. Inside foreachBatch the micro-batch DataFrame is bound to
    a CLONED SparkSession where pyspark's blocking Observation.get can
    wait forever (and the non-blocking accessor can NPE on a
    schema-less metrics row) — the stream used to hang on epoch 0.
    observation_metrics() + the count fallback must converge to the
    oracle with correct source_rows lineage."""
    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log).repartition(5)
    log_dir = str(tmp_path / "log")
    sdf.write.parquet(log_dir)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    eng = ReplayEngine(
        spark, table, config=EngineConfig(lineage=False, prune_buckets=False)
    )
    q = StreamingReplay(eng).start(
        log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    assert q.awaitTermination(180), "stream did not finish (observation hang?)"

    got = table.read().toPandas()
    exp = expected_final_state(log)
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])
    # the no-prepass n_src fallback fed the ledger: total source rows
    # across epochs == the full log
    assert sum(r[3] for r in table.applied_ranges()) == len(log)


def test_streaming_sessionize(spark, tmp_path):
    """Watermarked session_window aggregation over a parquet stream."""
    import pandas as pd
    from pyspark.sql import functions as F

    from neosync_spark.operators.sessions import sessionize_stream

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00",
                 "2024-01-01 02:00:00", "2024-01-01 00:05:00"]
            ),
        }
    )
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    agg = sessionize_stream(stream, "user_id", "ts", gap="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions").toPandas()
    # append mode emits only watermark-closed sessions: user 1's merged
    # 00:00-00:10 session and user 2's — the 02:00 event's session stays
    # open in the state store awaiting the watermark (correct streaming
    # semantics for late-data handling)
    assert len(got) == 2
    assert got[got.user_id == 1]["n_events"].tolist() == [2]
    assert got[got.user_id == 2]["n_events"].tolist() == [1]


def test_streaming_lww_stateful_updates(spark, tmp_path):
    """applyInPandasWithState LWW upsert stream: per key only winner
    CHANGES are emitted; stale events arriving in later micro-batches
    are absorbed by the state store; the union of last emissions ==
    the batch LWW oracle."""
    import pandas as pd
    from pyspark.sql import functions as F

    from neosync_spark.schema import change_event_schema
    from neosync_spark.streaming.stateful import streaming_lww_updates

    log = generate_pandas(SynthConfig(n_events=3_000, n_convs=150))
    log_dir = str(tmp_path / "log")
    # several files => several micro-batches; lsn-interleaved so late
    # (older-ts) events land in later batches too
    sdf = spark.createDataFrame(log).repartition(5)
    sdf.write.parquet(log_dir)

    stream = (
        spark.readStream.schema(change_event_schema(True))
        .option("maxFilesPerTrigger", "1")
        .parquet(log_dir)
    )
    updates = streaming_lww_updates(stream)
    q = (
        updates.writeStream.format("memory")
        .queryName("lww_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("lww_updates").toPandas()
    # last emission per key == global LWW winner
    last = (
        got.sort_values(["ts_us", "lsn"], kind="mergesort")
        .groupby(["conv_id", "turn_idx"])
        .tail(1)
    )
    alive = last[~last["deleted"]][["conv_id", "turn_idx", "role", "text"]]
    exp = expected_final_state(log)[["conv_id", "turn_idx", "role", "text"]]
    assert_pdf_equal(
        alive.reset_index(drop=True), exp, ["conv_id", "turn_idx"]
    )
    # the stream emitted no more rows than events, and strictly fewer
    # rows than a naive per-event relay when duplicates/stale exist
    assert len(got) <= len(log)
    # per key, no (ts_us, lsn) pair is emitted twice (duplicates and
    # stale deliveries are absorbed by the state, never re-emitted)
    assert not got.duplicated(["conv_id", "turn_idx", "ts_us", "lsn"]).any()


def test_streaming_fk_check(spark, tmp_path):
    """The FK row-skip path composes with the streaming front-end
    unchanged: foreachBatch drives the same apply_batch."""
    from pyspark.sql import functions as F

    from neosync_spark.engine import FkCheck

    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log).repartition(4)
    log_dir = str(tmp_path / "log")
    sdf.write.parquet(log_dir)

    convs = sorted(log["conv_id"].unique())
    allowed = convs[: len(convs) - 10]
    parent = spark.createDataFrame([(c,) for c in allowed], "conv_id string")

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    eng = ReplayEngine(
        spark, table,
        config=EngineConfig(fk_check=FkCheck(parent, "conv_id", "conv_id")),
    )
    q = StreamingReplay(eng).start(
        log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(120)

    got = table.read().toPandas()
    exp = expected_final_state(log[log["conv_id"].isin(allowed)])
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])
    quarantined = spark.read.parquet(
        str(tmp_path / "t" / "metadata" / "quarantine_fk")
    ).toPandas()
    assert len(quarantined) == int((~log["conv_id"].isin(allowed)).sum())


def test_streaming_then_incremental_rollup(spark, tmp_path):
    """Full incremental pipeline: stream-tail the log into the table,
    then advance a rollup table from the snapshots the stream produced —
    rollup == full recompute of the final state."""
    from neosync_spark.operators.rollup import (
        ROLLUP_SCHEMA,
        conversation_rollup,
        incremental_rollup_sync,
    )

    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log).repartition(4)
    log_dir = str(tmp_path / "log")
    sdf.write.parquet(log_dir)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "r"), ROLLUP_SCHEMA,
        key_cols=["conv_id"], order_cols=["ts"], n_buckets=8,
    )
    eng = ReplayEngine(spark, table, config=EngineConfig())
    q = StreamingReplay(eng).start(
        log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(120)

    history = table.history()
    sids = sorted(h["snapshot_id"] for h in history)
    # sync in two hops through an intermediate snapshot, then to head
    mid = sids[len(sids) // 2]
    head = sids[-1]
    incremental_rollup_sync(table, dst, None, mid)
    if head != mid:
        incremental_rollup_sync(table, dst, mid, head)

    got = {
        (r["conv_id"]): (r["n_turns"], r["total_chars"])
        for r in dst.read().collect()
    }
    exp = {
        (r["conv_id"]): (r["n_turns"], r["total_chars"])
        for r in conversation_rollup(table.read()).collect()
    }
    assert got == exp


def test_streaming_auto_rollup_tail(spark, tmp_path):
    """rollup_dst wired into StreamingReplay: the derived table tails
    the stream epoch by epoch (ledger-driven from-snapshot, so crashes
    and multi-epoch gaps self-heal) and ends equal to a full recompute."""
    from neosync_spark.operators.rollup import (
        ROLLUP_SCHEMA,
        conversation_rollup,
    )

    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log).repartition(6)
    log_dir = str(tmp_path / "log")
    sdf.write.parquet(log_dir)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "r"), ROLLUP_SCHEMA,
        key_cols=["conv_id"], order_cols=["ts"], n_buckets=8,
    )
    eng = ReplayEngine(spark, table, config=EngineConfig())
    q = StreamingReplay(eng, rollup_dst=dst).start(
        log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(120)

    got = {
        r["conv_id"]: (r["n_turns"], r["total_chars"])
        for r in dst.read().collect()
    }
    exp = {
        r["conv_id"]: (r["n_turns"], r["total_chars"])
        for r in conversation_rollup(table.read()).collect()
    }
    assert got == exp
    # multiple epochs => multiple rollup syncs in dst's ledger
    assert len(dst.applied_ranges()) >= 2


def test_streaming_patch_updates(spark, tmp_path):
    """Patch-aware stateful stream: partial images on the wire, folded
    full post-images downstream; final emissions match the sequential
    patch interpreter."""
    import pandas as pd

    from neosync_spark.schema import change_event_schema
    from neosync_spark.streaming.stateful import streaming_patch_updates

    rows = [
        # (lsn, op, conv_id, turn_idx, role, text, tool, ts)
        (0, "insert", "a", 0, "user", "v0", "t0", "2026-01-01 00:00:01"),
        (1, "patch", "a", 0, None, "v1", None, "2026-01-01 00:00:02"),
        (2, "patch", "a", 0, None, None, "t1", "2026-01-01 00:00:03"),
        (3, "insert", "b", 0, "user", "w0", None, "2026-01-01 00:00:01"),
        (4, "delete", "b", 0, None, None, None, "2026-01-01 00:00:04"),
        (5, "patch", "b", 0, None, "zombie", None, "2026-01-01 00:00:05"),
        (6, "patch", "ghost", 0, None, "orphan", None, "2026-01-01 00:00:06"),
        (7, "update", "a", 0, "user", "v2", None, "2026-01-01 00:00:07"),
        (8, "patch", "a", 0, None, None, "t2", "2026-01-01 00:00:08"),
        # duplicate delivery of lsn 8 — absorbed
        (8, "patch", "a", 0, None, None, "t2", "2026-01-01 00:00:08"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    log_dir = str(tmp_path / "plog")
    # two explicit files: streaming picks files in ARBITRARY order, so
    # the split is chosen to keep the final state order-invariant
    # (each key's full-image/patch causality lands within one file or
    # survives either inter-file order); maxFilesPerTrigger=1 still
    # forces cross-micro-batch state
    import os

    os.makedirs(log_dir, exist_ok=True)
    spark.createDataFrame(pdf[pdf["lsn"] < 5]).coalesce(1).write.parquet(
        log_dir + "/part1"
    )
    spark.createDataFrame(pdf[pdf["lsn"] >= 5]).coalesce(1).write.parquet(
        log_dir + "/part2"
    )
    log_dir = log_dir + "/part*"

    stream = (
        spark.readStream.schema(change_event_schema(True))
        .option("maxFilesPerTrigger", "1")
        .parquet(log_dir)
    )
    q = (
        streaming_patch_updates(stream)
        .writeStream.format("memory")
        .queryName("patch_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "pckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("patch_updates").toPandas()
    last = (
        got.sort_values(["ts_us", "lsn"], kind="mergesort")
        .groupby(["conv_id", "turn_idx"])
        .tail(1)
        .set_index(["conv_id", "turn_idx"])
    )
    # a: full reset at lsn 7 then patch tool at 8
    a = last.loc[("a", 0)]
    assert (a["role"], a["text"], a["tool"], a["deleted"]) == (
        "user", "v2", "t2", False,
    )
    # b: deleted; post-delete patch didn't resurrect
    b = last.loc[("b", 0)]
    assert bool(b["deleted"]) and b["text"] is None
    # ghost: orphan patch created no state, no emission
    assert ("ghost", 0) not in last.index
    # every 'a' emission carries a COMPLETE post-image (role never null)
    a_rows = got[(got["conv_id"] == "a") & (~got["deleted"])]
    assert a_rows["role"].notna().all() and a_rows["text"].notna().all()


def test_streaming_multi_consumer_tail(spark, tmp_path):
    """consumers=[rollup, secondary index, replica] all tail the
    stream epoch by epoch, each from its OWN ledger — after the stream
    drains: rollup == full recompute, index lookups == filter, replica
    == primary."""
    from pyspark.sql import functions as F

    from neosync_spark.operators.rollup import (
        ROLLUP_SCHEMA,
        conversation_rollup,
    )
    from neosync_spark.operators.secondary_index import (
        create_secondary_index,
        secondary_lookup,
    )
    from neosync_spark.plans.replicate import replica_schema
    from neosync_spark.streaming.consumers import (
        replica_consumer,
        rollup_consumer,
        secondary_index_consumer,
    )

    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log).repartition(6)
    log_dir = str(tmp_path / "log")
    sdf.write.parquet(log_dir)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "r"), ROLLUP_SCHEMA,
        key_cols=["conv_id"], order_cols=["ts"], n_buckets=8,
    )
    idx = create_secondary_index(
        spark, str(tmp_path / "i"), table, "role", n_buckets=8
    )
    rep = SnapshotTable.create(
        spark, str(tmp_path / "rep"), replica_schema(transcript_schema()),
        key_cols=KEY_COLS, n_buckets=8,
    )
    eng = ReplayEngine(spark, table, config=EngineConfig())
    q = StreamingReplay(
        eng,
        consumers=[
            rollup_consumer(dst),
            secondary_index_consumer(idx, "role"),
            replica_consumer(rep),
        ],
    ).start(log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    q.awaitTermination(120)

    got = {
        r["conv_id"]: (r["n_turns"], r["total_chars"])
        for r in dst.read().collect()
    }
    exp = {
        r["conv_id"]: (r["n_turns"], r["total_chars"])
        for r in conversation_rollup(table.read()).collect()
    }
    assert got == exp
    for role in ("user", "assistant"):
        want = sorted(
            tuple(r) for r in table.read()
            .filter(F.col("role") == role).select(*KEY_COLS).collect()
        )
        have = sorted(
            tuple(r) for r in secondary_lookup(table, idx, "role", role)
            .select(*KEY_COLS).collect()
        )
        assert have == want
    prim = sorted(
        tuple(r) for r in table.read()
        .select("conv_id", "turn_idx", "text").collect()
    )
    mirr = sorted(
        tuple(r) for r in rep.read()
        .select("conv_id", "turn_idx", "text").collect()
    )
    assert mirr == prim
    # every consumer saw multiple epochs through its own ledger
    assert len(dst.applied_ranges()) >= 2
    assert len(idx.applied_ranges()) >= 2
    assert len(rep.applied_ranges()) >= 2


def test_streaming_scd2_event_consumer_tail(spark, tmp_path):
    """event_consumers=[scd2_consumer]: the versioned dimension tails
    the stream epoch by epoch (events, not snapshot spans) and after
    the drain equals the one-shot scd2_history over the whole log in
    lsn order. The WAL is written as time-ordered lsn slices — the
    real binlog shape, and scd2_sync's documented contract (the
    in-order guard rejects interleaved epochs)."""
    import time as _time

    from neosync_spark.operators.scd import (
        scd2_dim_schema,
        scd2_history,
        scd2_state,
    )
    from neosync_spark.streaming.consumers import scd2_consumer

    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log)
    log_dir = str(tmp_path / "log")
    step = CFG.n_events // 4
    for i in range(5):
        part = sdf.filter(
            (sdf.lsn >= i * step) & (sdf.lsn < (i + 1) * step)
        )
        if part.count():
            part.coalesce(1).write.mode("append").parquet(log_dir)
            _time.sleep(1.1)  # distinct mtimes -> file-source order

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    attrs = ["role", "text", "tool"]
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"),
        scd2_dim_schema(sdf.schema, KEY_COLS, attrs),
        key_cols=[*KEY_COLS, "version_seq"], n_buckets=8,
    )
    eng = ReplayEngine(spark, table, config=EngineConfig())
    q = StreamingReplay(
        eng, event_consumers=[scd2_consumer(dim, KEY_COLS, attrs)]
    ).start(log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    q.awaitTermination(120)

    cols = [*KEY_COLS, "version_seq", *attrs,
            "valid_from_lsn", "valid_to_lsn", "is_current"]
    got = sorted(tuple(r) for r in scd2_state(dim).select(*cols).collect())
    want = sorted(
        tuple(r)
        for r in scd2_history(
            spark.createDataFrame(log).drop("ts"),
            KEY_COLS, order_cols=("lsn",), attr_cols=attrs,
        ).select(*cols).collect()
    )
    assert got == want
    assert len(dim.applied_ranges()) >= 2  # several epochs, own ledger


def test_streaming_follow_picks_up_new_files(spark, tmp_path):
    """follow=True (processingTime trigger): the tail keeps running and
    applies WAL files that arrive AFTER the stream started; the table
    converges to the full-log LWW state."""
    import time

    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log)
    hi = int(sdf.agg({"lsn": "max"}).collect()[0][0]) + 1
    mid = hi // 2
    log_dir = str(tmp_path / "log")
    sdf.filter(sdf.lsn < mid).coalesce(2).write.parquet(log_dir)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    eng = ReplayEngine(spark, table, config=EngineConfig())
    q = StreamingReplay(eng).start(
        log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=4,
        follow=True, processing_interval="1 seconds",
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if table.last_applied_lsn() is not None:
                break
            time.sleep(1)
        # second half arrives while the stream runs
        sdf.filter(sdf.lsn >= mid).coalesce(2).write.mode("append").parquet(
            log_dir
        )
        while time.time() < deadline:
            last = table.last_applied_lsn()
            if last is not None and last >= hi - 1:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = table.read().toPandas()
    exp = expected_final_state(log)
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])
