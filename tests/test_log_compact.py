"""Changelog compaction (operators/log_compact.py) — Kafka
compacted-topic semantics over the WAL itself.

Load-bearing invariant: replaying the COMPACTED log through the engine
yields exactly the final state of replaying the FULL log (the same
row-level source↔target equality the reference's workflow tests assert,
/root/reference/internal/testutil/testdata/verify.go:107-132) — while
the compacted log is O(live keys), not O(history).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.log_compact import (
    compact_changelog,
    compact_changelog_dir,
    read_compaction_manifest,
)
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.sources.changelog import ChangeLogSource
from neosync_spark.synth import SynthConfig, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=8_000, n_convs=300)


def _replay_dir(spark, tmp_path, name, log_dir, batch=3000):
    t = SnapshotTable.create(
        spark, str(tmp_path / name), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    eng = ReplayEngine(
        spark, t, config=EngineConfig(batch_lsn_size=batch, lineage=False),
    )
    eng.replay(ChangeLogSource(spark, log_dir))
    return t.read().toPandas()


def test_compacted_replay_equals_full_replay(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(log_dir)
    out = str(tmp_path / "compacted")
    m = compact_changelog_dir(spark, log_dir, out)

    full = _replay_dir(spark, tmp_path, "t_full", log_dir)
    boot = _replay_dir(spark, tmp_path, "t_boot", out)
    assert_pdf_equal(boot, full, ["conv_id", "turn_idx"])

    # compaction actually shrank the log, and one event per key
    # synth injects at-least-once duplicate deliveries on top of n_events
    assert m["events_in"] >= CFG.n_events
    assert m["events_out"] < m["events_in"]
    comp = spark.read.parquet(out)
    n_keys = comp.select(*KEY_COLS).distinct().count()
    assert comp.count() == n_keys == m["events_out"]
    # the manifest watermark is the WAL high-water a consumer resumes from
    assert m["lsn_hi"] == CFG.n_events - 1


def test_tombstones_kept_then_dropped(spark, tmp_path):
    rows = [
        (0, "insert", "c1", 0, "user", "a", None, "2026-01-01 00:00:00"),
        (1, "delete", "c1", 0, None, None, None, "2026-01-01 00:00:01"),
        (2, "insert", "c2", 0, "user", "b", None, "2026-01-01 00:00:02"),
    ]
    log = spark.createDataFrame(
        [(c, t, r, x, tl, ts, op, lsn)
         for (lsn, op, c, t, r, x, tl, ts) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, op string, lsn long",
    ).withColumn("ts", F.to_timestamp("ts"))

    kept = compact_changelog(log).collect()
    by_key = {(r["conv_id"], r["turn_idx"]): r["op"] for r in kept}
    assert by_key[("c1", 0)] == "delete"  # tombstone retained by default
    assert by_key[("c2", 0)] == "insert"

    dropped = compact_changelog(log, drop_tombstones=True).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in dropped} == {("c2", 0)}


def test_patch_ops_fold_to_full_images(spark, tmp_path):
    rows = [
        # full insert, then two patches; compaction must emit ONE full
        # image carrying the folded values, never a patch
        (0, "insert", "c1", 0, "user", "v0", None, "2026-01-01 00:00:00"),
        (1, "patch", "c1", 0, None, "v1", None, "2026-01-01 00:00:01"),
        (2, "patch", "c1", 0, None, None, "browser", "2026-01-01 00:00:02"),
        # orphan patch (no full image): dropped
        (3, "patch", "c9", 0, None, "x", None, "2026-01-01 00:00:03"),
        # post-delete patch: must not resurrect
        (4, "insert", "c2", 0, "user", "a", None, "2026-01-01 00:00:04"),
        (5, "delete", "c2", 0, None, None, None, "2026-01-01 00:00:05"),
        (6, "patch", "c2", 0, None, "zombie", None, "2026-01-01 00:00:06"),
    ]
    log = spark.createDataFrame(
        [(c, t, r, x, tl, ts, op, lsn)
         for (lsn, op, c, t, r, x, tl, ts) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, op string, lsn long",
    ).withColumn("ts", F.to_timestamp("ts"))

    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in compact_changelog(log, patch_ops=True).collect()
    }
    assert set(out) == {("c1", 0), ("c2", 0)}
    r = out[("c1", 0)]
    assert (r["op"], r["role"], r["text"], r["tool"]) == (
        "update", "user", "v1", "browser",
    )
    assert r["lsn"] == 2  # ordering state advanced by the last patch
    z = out[("c2", 0)]
    assert z["op"] == "delete" and z["text"] is None


def test_recompaction_is_stable(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(log_dir)
    once = compact_changelog(spark.read.parquet(log_dir))
    twice = compact_changelog(once)
    assert_pdf_equal(
        twice.toPandas(), once.toPandas(), ["conv_id", "turn_idx"]
    )


def test_compaction_is_one_shuffle(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(log_dir)
    comp = compact_changelog(spark.read.parquet(log_dir))
    plan = comp._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # partial+final agg, single shuffle
    assert "BatchEvalPython" not in plan


def test_cli_compact_log_bootstrap_verifies(spark, tmp_path, capsys):
    from neosync_spark.cli import main

    log_dir = str(tmp_path / "log")
    out = str(tmp_path / "comp")
    table = str(tmp_path / "t")
    assert main(["synth", "--out", log_dir, "--events", "3000"]) == 0
    assert main(["compact-log", "--log", log_dir, "--out", out]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < m["events_out"] < m["events_in"]
    assert read_compaction_manifest(out)["lsn_hi"] == m["lsn_hi"]

    # bootstrap a fresh table from the compacted log, then verify the
    # final state against the ORIGINAL full log's LWW oracle
    assert main(["replay", "--log", out, "--table", table]) == 0
    assert main(["verify", "--log", log_dir, "--table", table]) == 0
    assert '"match": true' in capsys.readouterr().out


# ---------- property: compaction == a sequential interpreter ----------

import pandas as pd  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_mixed_event = st.tuples(
    st.sampled_from(["insert", "update", "delete", "patch", "patch"]),
    st.integers(0, 2),  # conv
    st.integers(0, 1),  # turn
    st.integers(0, 4),  # ts second (ties likely)
    st.sampled_from([None, "", "aa", "Zb1"]),  # text
    st.sampled_from([None, "t1"]),  # tool
)


def _interpret(rows):
    """Sequential (ts, lsn)-ordered oracle: live final state per key."""
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state[k] = None
        elif r["op"] == "patch":
            cur = state.get(k)
            if cur is not None:
                state[k] = tuple(
                    n if n is not None else c
                    for n, c in zip((r["role"], r["text"], r["tool"]), cur)
                )
        else:
            state[k] = (r["role"], r["text"], r["tool"])
    return {k: v for k, v in state.items() if v is not None}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture, HealthCheck.too_slow,
    ],
)
@given(events=st.lists(_mixed_event, min_size=1, max_size=30))
def test_compaction_matches_interpreter(spark, events):
    rows = []
    for lsn, (op, conv, turn, ts_s, txt, tool) in enumerate(events):
        full = op in ("insert", "update")
        rows.append(
            {
                "conv_id": f"c{conv}",
                "turn_idx": turn,
                "role": "user" if full else None,
                "text": txt if (full or op == "patch") else None,
                "tool": tool if (full or op == "patch") else None,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=ts_s),
                "op": op,
                "lsn": lsn,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    comp = compact_changelog(spark.createDataFrame(pdf), patch_ops=True)
    live = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in comp.collect()
        if r["op"] != "delete"
    }
    assert live == _interpret(rows)
    # the compacted log never contains a patch and is one event per key
    ops = [r["op"] for r in comp.collect()]
    assert "patch" not in ops


def test_bootstrap_then_resume_live_wal(spark, tmp_path, capsys):
    """The operational story end-to-end: compact the WAL at watermark T,
    bootstrap a fresh table from the compacted log, then point the
    ordinary replay at the FULL live WAL — the ledger resumes past the
    bootstrap watermark, applies only the suffix, and the final state
    equals replaying the whole history."""
    import json as _json

    from neosync_spark.cli import main

    full_dir = str(tmp_path / "wal")
    pdf = generate_pandas(CFG)
    spark.createDataFrame(pdf).write.parquet(full_dir)
    # the prefix that existed when the compaction ran
    mid = CFG.n_events // 2
    prefix_dir = str(tmp_path / "wal_prefix")
    spark.read.parquet(full_dir).filter(F.col("lsn") < mid).write.parquet(
        prefix_dir
    )

    comp_dir = str(tmp_path / "comp")
    assert main(["compact-log", "--log", prefix_dir, "--out", comp_dir]) == 0
    m = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["lsn_hi"] == mid - 1

    table = str(tmp_path / "t")
    assert main(["replay", "--log", comp_dir, "--table", table]) == 0
    capsys.readouterr()
    # live suffix arrives; ordinary replay resumes from the ledger
    assert main(["replay", "--log", full_dir, "--table", table]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["batches_applied"] >= 1  # the suffix actually applied

    assert main(["verify", "--log", full_dir, "--table", table]) == 0
    assert '"match": true' in capsys.readouterr().out


def test_incremental_recompaction_equals_full(spark, tmp_path, capsys):
    """compact(base ∪ suffix) == compact(full history): LWW max_by is
    associative, so the cleaner never re-reads cleaned history. The
    suffix scan's lsn filter is pushed to the parquet reader."""
    import json as _json

    from neosync_spark.cli import main

    full_dir = str(tmp_path / "wal")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(full_dir)
    mid = CFG.n_events // 2
    prefix_dir = str(tmp_path / "wal_prefix")
    spark.read.parquet(full_dir).filter(F.col("lsn") < mid).write.parquet(
        prefix_dir
    )

    base = str(tmp_path / "comp0")
    inc = str(tmp_path / "comp1")
    scratch = str(tmp_path / "comp_full")
    assert main(["compact-log", "--log", prefix_dir, "--out", base]) == 0
    capsys.readouterr()
    assert main([
        "compact-log", "--log", full_dir, "--out", inc, "--base", base,
    ]) == 0
    m_inc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(["compact-log", "--log", full_dir, "--out", scratch]) == 0
    m_full = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert_pdf_equal(
        spark.read.parquet(inc).toPandas(),
        spark.read.parquet(scratch).toPandas(),
        ["conv_id", "turn_idx"],
    )
    assert m_inc["lsn_hi"] == m_full["lsn_hi"]
    # the incremental pass read less than the full history
    assert m_inc["events_in"] < m_full["events_in"]
