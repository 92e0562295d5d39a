"""DBLog-style incremental snapshot: chunked re-snapshot of a live
source interleaved with the change stream (operators/incremental_snapshot).
"""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.dedup import lww_dedup
from neosync_spark.operators.incremental_snapshot import (
    IncrementalSnapshot,
    chunk_predicate,
    plan_chunks,
)
from neosync_spark.schema import KEY_COLS, transcript_schema

T0 = datetime(2024, 1, 1)


def _log(spark, events):
    """events: (lsn, op, conv_id, turn_idx, text) — ts tracks lsn."""
    rows = [
        (
            lsn,
            op,
            conv,
            turn,
            "user" if op != "delete" else None,
            text if op != "delete" else None,
            None,
            T0 + timedelta(seconds=lsn),
        )
        for (lsn, op, conv, turn, text) in events
    ]
    return spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string,"
        " text string, tool string, ts timestamp",
    )


def _gen_events(n_keys=60, n_events=400):
    """Deterministic mixed-op log: inserts, updates, deletes,
    re-inserts after delete."""
    ev = []
    for lsn in range(n_events):
        k = (lsn * 7) % n_keys
        conv, turn = f"c{k % 20:03d}", k // 20
        r = lsn % 11
        op = "delete" if r == 10 and lsn > n_keys else (
            "insert" if lsn < n_keys else "update"
        )
        ev.append((lsn, op, conv, turn, f"v{lsn}"))
    return ev


def _state(log, lw=None):
    """Live-source view at WAL position lw: LWW fold, deletes gone."""
    df = log if lw is None else log.filter(F.col("lsn") <= lw)
    fold = lww_dedup(df, KEY_COLS, ["ts", "lsn"])
    return fold.filter(F.col("op") != "delete").drop("op", "lsn")


def _mk_table(spark):
    return SnapshotTable.create(
        spark,
        tempfile.mkdtemp(prefix="ns_incsnap_"),
        transcript_schema(),
        key_cols=KEY_COLS,
        n_buckets=4,
    )


def _read_sorted(table):
    return (
        table.read()
        .select("conv_id", "turn_idx", "text")
        .sort("conv_id", "turn_idx")
        .collect()
    )


def test_chunks_partition_keyspace(spark):
    log = _log(spark, _gen_events())
    src = _state(log)
    n = src.count()
    plan = plan_chunks(src, KEY_COLS, chunk_rows=max(1, n // 5))
    assert plan.n_chunks >= 3
    total = 0
    for i in range(plan.n_chunks):
        total += src.filter(chunk_predicate(plan, i)).count()
    # every key in exactly one chunk: counts add up to the whole
    assert total == n


def test_snapshot_only_equals_source(spark):
    log = _log(spark, _gen_events())
    src = _state(log)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    table = _mk_table(spark)
    snap = IncrementalSnapshot(
        table,
        src,
        tempfile.mkdtemp(prefix="ns_incsnap_st_"),
        chunk_rows=max(1, src.count() // 4),
    )
    out = snap.run(lw=hi)
    assert out["done"] and out["chunks_applied"] == snap.plan.n_chunks
    assert _read_sorted(table) == (
        src.select("conv_id", "turn_idx", "text")
        .sort("conv_id", "turn_idx")
        .collect()
    )


def test_interleaved_chunks_and_stream_converge(spark):
    """Chunks at advancing watermarks, stream slices in between, in
    arbitrary relative order — final state == full-log LWW fold."""
    log = _log(spark, _gen_events()).cache()
    hi = log.agg(F.max("lsn")).collect()[0][0]
    w0, w1, w2 = int(hi * 0.4), int(hi * 0.6), int(hi * 0.8)
    table = _mk_table(spark)

    def stream(lo, hi_):  # (lo, hi_] as a raw CDC batch
        sl = log.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi_))
        table.merge_cdc(
            sl, applied_range=(lo + 1, hi_ + 1), source_is_raw=True
        )

    snap = IncrementalSnapshot(
        table,
        _state(log, w0),
        tempfile.mkdtemp(prefix="ns_incsnap_il_"),
        chunk_rows=max(1, _state(log, w0).count() // 3 + 1),
    )
    assert snap.plan.n_chunks >= 3
    # stream runs AHEAD of the first chunk: stale chunk rows must not
    # clobber newer streamed values
    stream(w0, w1)
    snap.step(lw=w0)  # chunk 0 read at the OLD watermark
    snap.step(lw=w1, source=_state(log, w1))  # chunk 1 at a newer one
    stream(w1, w2)
    snap.run(lw=w2, source=_state(log, w2))  # remaining chunks
    stream(w2, hi)

    expect = (
        _state(log)
        .select("conv_id", "turn_idx", "text")
        .sort("conv_id", "turn_idx")
        .collect()
    )
    assert _read_sorted(table) == expect


def test_stale_chunk_never_clobbers_newer_stream_row(spark):
    """Pinned adversarial case: the stream applies an update AND a
    delete after the chunk's watermark; the late chunk apply must keep
    both outcomes."""
    ev = [
        (0, "insert", "a", 0, "old-a"),
        (1, "insert", "b", 0, "old-b"),
        (2, "insert", "c", 0, "old-c"),
        # after lw=2:
        (3, "update", "a", 0, "new-a"),
        (4, "delete", "b", 0, None),
    ]
    log = _log(spark, ev)
    table = _mk_table(spark)
    # stream lands first
    table.merge_cdc(
        log.filter(F.col("lsn") > 2),
        applied_range=(3, 5),
        source_is_raw=True,
    )
    snap = IncrementalSnapshot(
        table,
        _state(log, 2),  # still has old-a and b
        tempfile.mkdtemp(prefix="ns_incsnap_stale_"),
        chunk_rows=100,
    )
    snap.run(lw=2)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}
    assert rows == {("a", 0): "new-a", ("c", 0): "old-c"}


def test_resume_from_state_dir(spark):
    log = _log(spark, _gen_events())
    src = _state(log)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    table = _mk_table(spark)
    st = tempfile.mkdtemp(prefix="ns_incsnap_res_")
    chunk_rows = max(1, src.count() // 4)
    snap = IncrementalSnapshot(table, src, st, chunk_rows=chunk_rows)
    n_chunks = snap.plan.n_chunks
    assert n_chunks >= 3
    snap.step(lw=hi)
    del snap
    # a NEW process picks up at chunk 1 with the persisted boundaries
    snap2 = IncrementalSnapshot(table, src, st, chunk_rows=chunk_rows)
    assert snap2.state["next_chunk"] == 1
    out = snap2.run(lw=hi)
    assert out["done"] and out["chunks_applied"] == n_chunks - 1
    assert _read_sorted(table) == (
        src.select("conv_id", "turn_idx", "text")
        .sort("conv_id", "turn_idx")
        .collect()
    )


def test_lost_state_write_heals_via_ledger_noop(spark):
    """Crash between merge and state write: the retried chunk hits the
    synthetic ledger range and no-ops instead of rewriting buckets."""
    log = _log(spark, _gen_events(n_keys=20, n_events=60))
    src = _state(log)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    table = _mk_table(spark)
    st = tempfile.mkdtemp(prefix="ns_incsnap_crash_")
    snap = IncrementalSnapshot(table, src, st, chunk_rows=max(1, src.count() // 3))
    first = snap.step(lw=hi)
    assert first["rows_applied"] > 0
    # simulate the lost state write
    snap.state["next_chunk"] = 0
    snap._save()
    retried = snap.step(lw=hi)
    assert retried["chunk"] == 0 and retried["rows_applied"] == 0
    snap.run(lw=hi)
    assert table.read().count() == src.count()


def test_chunk_scan_pushes_key_range(spark, tmp_path):
    """The chunk read must reach parquet as pushed filters on the
    leading key column (row-group pruning at 100 TB)."""
    log = _log(spark, _gen_events())
    src_path = str(tmp_path / "src.parquet")
    _state(log).write.parquet(src_path)
    src = spark.read.parquet(src_path)
    plan = plan_chunks(src, KEY_COLS, chunk_rows=max(1, src.count() // 4))
    assert plan.n_chunks >= 2
    scan = src.filter(chunk_predicate(plan, 1))
    plan_str = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan_str
    assert "GreaterThanOrEqual(conv_id" in plan_str or "IsNotNull(conv_id" in plan_str


def test_synthetic_ranges_do_not_fast_forward_batch_replay(spark):
    """Regression: chunk applies (and streaming file-set epochs) record
    synthetic high-bit ledger identities; the engine's resume
    fast-forward must not read them as a real-lsn high-water — doing so
    would skip the entire log in a later batch replay."""
    from neosync_spark.engine import EngineConfig, ReplayEngine
    from neosync_spark.lakehouse import SYNTHETIC_LSN_BASE

    log = _log(spark, _gen_events()).cache()
    hi = log.agg(F.max("lsn")).collect()[0][0]
    w0 = int(hi * 0.4)
    table = _mk_table(spark)
    snap = IncrementalSnapshot(
        table,
        _state(log, w0),
        tempfile.mkdtemp(prefix="ns_incsnap_ff_"),
        chunk_rows=10 ** 9,  # one chunk is enough
    )
    snap.run(lw=w0)
    assert table.last_applied_lsn() is None  # only synthetic rows so far
    assert all(b < SYNTHETIC_LSN_BASE for b in table.checkpoint_boundaries())
    eng = ReplayEngine(
        spark,
        table,
        config=EngineConfig(
            batch_lsn_size=hi + 1, lineage=False, prune_buckets=False
        ),
    )

    def slicer(lo, hi_):
        return log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi_))

    stats = eng.replay(slicer, lsn_lo=w0 + 1, lsn_hi=int(hi))
    assert stats.batches_applied >= 1  # NOT fast-forwarded to nothing
    expect = (
        _state(log)
        .select("conv_id", "turn_idx", "text")
        .sort("conv_id", "turn_idx")
        .collect()
    )
    assert _read_sorted(table) == expect
    log.unpersist()


_prop_counter = {"i": 0}


def test_random_interleave_always_converges(spark, tmp_path_factory):
    """Property: for ANY WAL-consistent log (ts tracks lsn — the
    commit-order guarantee a real WAL gives), ANY stream cut points,
    ANY number of chunks, ANY per-chunk watermark >= the stream start,
    and ANY interleave of chunk applies among stream slices, the final
    state equals the full-log LWW oracle."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from neosync_spark.synth import expected_final_state

    root = tmp_path_factory.mktemp("incsnap_prop")

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(data=st.data())
    def prop(data):
        import pandas as pd

        ev = data.draw(
            st.lists(
                st.tuples(
                    st.sampled_from(["insert", "update", "delete"]),
                    st.integers(0, 5),  # conv
                    st.integers(0, 2),  # turn
                ),
                min_size=30,
                max_size=90,
            )
        )
        rows = []
        for lsn, (op, conv, turn) in enumerate(ev):
            is_del = op == "delete"
            rows.append(
                {
                    "lsn": lsn,
                    "op": op,
                    "conv_id": f"c{conv}",
                    "turn_idx": turn,
                    "role": None if is_del else "user",
                    "text": None if is_del else f"v{lsn}",
                    "tool": None,
                    "ts": T0 + timedelta(seconds=lsn),
                }
            )
        pdf = pd.DataFrame(rows)
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        log = spark.createDataFrame(pdf)
        hi = len(ev) - 1
        w0 = data.draw(st.integers(0, hi - 1))
        c1 = data.draw(st.integers(w0, hi))
        c2 = data.draw(st.integers(c1, hi))
        windows = [(w0, c1), (c1, c2), (c2, hi)]  # (lo, hi] slices
        n_chunks_wanted = data.draw(st.integers(1, 4))
        # chunk interleave slot (0..3 = before window i / after all)
        slots = data.draw(
            st.lists(st.integers(0, 3), min_size=4, max_size=4)
        )
        _prop_counter["i"] += 1
        table = SnapshotTable.create(
            spark,
            str(root / f"t{_prop_counter['i']}"),
            transcript_schema(),
            key_cols=KEY_COLS,
            n_buckets=2,
        )
        src0 = _state(log, w0)
        n0 = max(1, src0.count())
        snap = IncrementalSnapshot(
            table,
            src0,
            str(root / f"st{_prop_counter['i']}"),
            chunk_rows=max(1, -(-n0 // n_chunks_wanted)),
        )

        def chunk_step():
            if not snap.done:
                lw = data.draw(st.integers(w0, hi))
                snap.step(lw=lw, source=_state(log, lw))

        for i, (lo, hi_) in enumerate(windows):
            for s in slots:
                if s == i:
                    chunk_step()
            if hi_ > lo:
                sl = log.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi_))
                table.merge_cdc(
                    sl, applied_range=(lo + 1, hi_ + 1), source_is_raw=True
                )
        while not snap.done:
            chunk_step()
        got = table.read().toPandas()
        exp = expected_final_state(pdf)
        from .conftest import assert_pdf_equal

        assert_pdf_equal(
            got, exp, ["conv_id", "turn_idx"],
            msg=f"w0={w0} cuts=({c1},{c2}) slots={slots}",
        )

    prop()


def test_cli_tail_with_bootstrap_chunks(spark, tmp_path, capsys):
    """CLI `tail --bootstrap-source`: the WAL dir holds only
    post-watermark events (bounded retention — the reason incremental
    snapshots exist); one chunk applies per epoch, the rest finish
    after the drain, and the table converges on the FULL-log LWW state."""
    import json as _json

    from neosync_spark.cli import main

    log_full = str(tmp_path / "log_full")
    assert main(["synth", "--out", log_full, "--events", "3000"]) == 0
    capsys.readouterr()
    log = spark.read.parquet(log_full)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    mid = int(hi) // 2
    src = str(tmp_path / "src")
    _state(log, mid).write.parquet(src)
    wal_tail = str(tmp_path / "wal_tail")
    (
        log.filter(F.col("lsn") > mid)
        .repartition(4)
        .write.parquet(wal_tail)
    )
    table = str(tmp_path / "t")
    assert main([
        "tail", "--log", wal_tail, "--table", table,
        "--checkpoint", str(tmp_path / "ck"),
        "--bootstrap-source", src,
        "--bootstrap-state", str(tmp_path / "bs"),
        "--source-lsn", str(mid),
        "--bootstrap-chunk-rows", "150",
        "--max-files", "2",
    ]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrap"]["done"] and out["bootstrap"]["chunks"] >= 2
    # final state == LWW over the FULL log, though the WAL only held
    # its tail
    assert main(["verify", "--log", log_full, "--table", table]) == 0
    assert '"match": true' in capsys.readouterr().out


def test_bootstrap_applies_stream_mappings(spark, tmp_path, capsys):
    """An anonymized destination must not bootstrap UNMASKED history:
    chunks land through the same transforms as the stream, and the
    result equals a full-log replay under the same mapping (both CLI
    paths: tail --bootstrap-source and snapshot-sync --mapping)."""
    import json as _json

    from neosync_spark.cli import main

    log_full = str(tmp_path / "log_full")
    assert main(["synth", "--out", log_full, "--events", "2500"]) == 0
    control = str(tmp_path / "control")
    assert main([
        "replay", "--log", log_full, "--table", control,
        "--mapping", "text=transform_pii_text",
    ]) == 0
    capsys.readouterr()
    log = spark.read.parquet(log_full)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    mid = int(hi) // 2
    src = str(tmp_path / "src")
    _state(log, mid).write.parquet(src)
    wal_tail = str(tmp_path / "wal_tail")
    log.filter(F.col("lsn") > mid).repartition(3).write.parquet(wal_tail)

    def _read(table_path):
        t = SnapshotTable.load(spark, table_path)
        return (
            t.read()
            .select("conv_id", "turn_idx", "role", "text", "tool")
            .sort("conv_id", "turn_idx")
            .collect()
        )

    expect = _read(control)

    # path 1: tail with in-stream bootstrap
    t1 = str(tmp_path / "t1")
    assert main([
        "tail", "--log", wal_tail, "--table", t1,
        "--checkpoint", str(tmp_path / "ck1"),
        "--bootstrap-source", src,
        "--bootstrap-state", str(tmp_path / "bs1"),
        "--source-lsn", str(mid),
        "--bootstrap-chunk-rows", "200", "--max-files", "2",
        "--mapping", "text=transform_pii_text",
    ]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrap"]["done"]
    assert _read(t1) == expect

    # path 2: snapshot-sync --mapping + replay --mapping of the tail
    t2 = str(tmp_path / "t2")
    assert main([
        "snapshot-sync", "--source", src, "--source-lsn", str(mid),
        "--table", t2, "--state", str(tmp_path / "bs2"),
        "--chunk-rows", "200",
        "--mapping", "text=transform_pii_text",
    ]) == 0
    assert main([
        "replay", "--log", wal_tail, "--table", t2,
        "--mapping", "text=transform_pii_text",
    ]) == 0
    capsys.readouterr()
    assert _read(t2) == expect


def test_concurrent_stream_writer_and_snapshot_process_converge(spark):
    """The real DBLog deployment: the snapshot runs as its OWN process
    racing the live tail on the same table. Chunk commits and stream
    commits collide on buckets; under on_conflict='retry' both sides
    recompute from the new head and the table still converges on the
    full-log LWW state with every ledger entry intact."""
    import threading

    log = _log(spark, _gen_events(n_keys=60, n_events=400)).cache()
    log.count()
    hi = log.agg(F.max("lsn")).collect()[0][0]
    w0 = int(hi * 0.4)
    table = _mk_table(spark)
    errors = []

    def stream_worker():
        try:
            step = max(1, (hi - w0) // 4)
            lo = w0
            while lo < hi:
                hi_ = min(hi, lo + step)
                sl = log.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi_))
                table.merge_cdc(
                    sl,
                    applied_range=(lo + 1, hi_ + 1),
                    source_is_raw=True,
                    on_conflict="retry",
                    _retry_budget=8,
                )
                lo = hi_
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    def snapshot_worker():
        try:
            src = _state(log, w0)
            snap = IncrementalSnapshot(
                table,
                src,
                tempfile.mkdtemp(prefix="ns_incsnap_conc_"),
                chunk_rows=max(1, src.count() // 3 + 1),
            )
            snap.run(lw=w0, on_conflict="retry", _retry_budget=8)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    ts_ = [
        threading.Thread(target=stream_worker),
        threading.Thread(target=snapshot_worker),
    ]
    for t in ts_:
        t.start()
    for t in ts_:
        t.join()
    assert not errors, errors
    expect = (
        _state(log)
        .select("conv_id", "turn_idx", "text")
        .sort("conv_id", "turn_idx")
        .collect()
    )
    assert _read_sorted(table) == expect
    # every stream window's exactly-once entry survived the races
    step = max(1, (hi - w0) // 4)
    lo = w0
    while lo < hi:
        hi_ = min(hi, lo + step)
        assert table.is_applied(lo + 1, hi_ + 1)
        lo = hi_
    log.unpersist()


def test_source_with_cdc_columns_rejected(spark):
    log = _log(spark, _gen_events(n_keys=10, n_events=20))
    table = _mk_table(spark)
    snap = IncrementalSnapshot(
        table,
        _state(log),
        tempfile.mkdtemp(prefix="ns_incsnap_guard_"),
        chunk_rows=1000,
    )
    with pytest.raises(ValueError, match="CDC columns"):
        snap.step(lw=5, source=log)  # raw log still carries op/lsn
