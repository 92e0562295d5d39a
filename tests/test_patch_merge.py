"""Partial row images (op='patch'): NULL payload column = unchanged.

The MySQL-minimal-row-image / partial-Debezium-envelope case, folded in
ONE key-shuffle aggregate (operators.dedup.patch_fold) against target
rows and full images alike. An independent pandas replay is the oracle.
"""

from __future__ import annotations

import pandas as pd
import pytest

from neosync_spark.operators.dedup import patch_fold

from .test_lakehouse import _batch, _mk


def _patch_batch(spark, rows):
    """rows: (lsn, op, conv_id, turn_idx, role, text, tool, ts)."""
    return _batch(spark, rows)


def _state(t):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in t.read().collect()
    }


def test_patch_sets_only_non_null_columns(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _patch_batch(spark, [
            (1, "insert", "c1", 0, "user", "hello", "search", "2026-01-01 00:00:01"),
            (2, "insert", "c1", 1, "assistant", "hi", None, "2026-01-01 00:00:02"),
        ]),
        applied_range=(0, 10),
        patch_ops=True,
        source_is_raw=True,
    )
    # patch touches tool only; text/role stay
    t.merge_cdc(
        _patch_batch(spark, [
            (11, "patch", "c1", 0, None, None, "browser", "2026-01-01 00:00:03"),
        ]),
        applied_range=(10, 20),
        patch_ops=True,
        source_is_raw=True,
    )
    assert _state(t) == {
        ("c1", 0): ("user", "hello", "browser"),
        ("c1", 1): ("assistant", "hi", None),
    }


def test_in_batch_patch_chain_and_full_image_reset(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _patch_batch(spark, [
            (1, "insert", "c", 0, "user", "v0", "t0", "2026-01-01 00:00:01"),
            (2, "patch", "c", 0, None, "v1", None, "2026-01-01 00:00:02"),
            (3, "patch", "c", 0, None, None, "t1", "2026-01-01 00:00:03"),
            # full update RESETS every column (tool back to NULL)
            (4, "update", "c", 0, "user", "v2", None, "2026-01-01 00:00:04"),
            (5, "patch", "c", 0, None, None, "t2", "2026-01-01 00:00:05"),
        ]),
        applied_range=(0, 10),
        patch_ops=True,
        source_is_raw=True,
    )
    assert _state(t) == {("c", 0): ("user", "v2", "t2")}


def test_patch_cannot_resurrect_and_orphan_dropped(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _patch_batch(spark, [
            (1, "insert", "c", 0, "user", "x", None, "2026-01-01 00:00:01"),
            (2, "delete", "c", 0, None, None, None, "2026-01-01 00:00:02"),
            (3, "patch", "c", 0, None, "zombie", None, "2026-01-01 00:00:03"),
            (4, "patch", "ghost", 0, None, "orphan", None, "2026-01-01 00:00:04"),
        ]),
        applied_range=(0, 10),
        patch_ops=True,
        source_is_raw=True,
    )
    assert _state(t) == {}
    # a later INSERT does resurrect — and earlier patches don't bleed in
    t.merge_cdc(
        _patch_batch(spark, [
            (11, "insert", "c", 0, "user", "fresh", None, "2026-01-01 00:00:05"),
        ]),
        applied_range=(10, 20),
        patch_ops=True,
        source_is_raw=True,
    )
    assert _state(t) == {("c", 0): ("user", "fresh", None)}


def test_patch_replay_matches_pandas_oracle(spark, tmp_path):
    """Randomized history, replayed in 3 batches; an independent
    row-at-a-time pandas interpreter is the oracle."""
    import random

    rng = random.Random(7)
    cols = ["role", "text", "tool"]
    events = []
    lsn = 0
    keys = [(f"c{i}", j) for i in range(6) for j in range(3)]
    live: set = set()
    for _ in range(240):
        k = rng.choice(keys)
        if k not in live or rng.random() < 0.3:
            op = "insert" if k not in live else "update"
            vals = [f"{c}{lsn}" if rng.random() < 0.8 else None for c in cols]
            live.add(k)
        elif rng.random() < 0.15:
            op, vals = "delete", [None] * 3
            live.discard(k)
        else:
            op = "patch"
            vals = [f"{c}{lsn}" if rng.random() < 0.4 else None for c in cols]
        events.append(
            (lsn, op, k[0], k[1], vals[0], vals[1], vals[2],
             f"2026-01-01 00:{lsn // 60:02d}:{lsn % 60:02d}")
        )
        lsn += 1

    t = _mk(spark, tmp_path / "t")
    for i in range(3):
        chunk = [e for e in events if i * 80 <= e[0] < (i + 1) * 80]
        t.merge_cdc(
            _patch_batch(spark, chunk),
            applied_range=(i * 80, (i + 1) * 80),
            patch_ops=True,
            source_is_raw=True,
        )

    # oracle: sequential interpreter
    state: dict = {}
    for (l, op, cid, ti, role, text, tool, _ts) in events:
        k = (cid, ti)
        if op == "delete":
            state[k] = None
        elif op == "patch":
            cur = state.get(k)
            if cur is not None and k in state:
                state[k] = tuple(
                    n if n is not None else c
                    for n, c in zip((role, text, tool), cur)
                )
        else:
            state[k] = (role, text, tool)
    want = {k: v for k, v in state.items() if v is not None}
    assert _state(t) == want


def test_patch_requires_cow_raw(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    b = _patch_batch(
        spark, [(1, "insert", "c", 0, "u", "x", None, "2026-01-01 00:00:01")]
    )
    with pytest.raises(ValueError, match="patch_ops"):
        t.merge_cdc(b, mode="mor", patch_ops=True, source_is_raw=True)
    with pytest.raises(ValueError, match="patch_ops"):
        t.merge_cdc(b, mode="cow", patch_ops=True, source_is_raw=False)


def test_patch_fold_is_one_aggregate_no_window(spark):
    """Plan shape: the fold is partial+final hash aggregation (map-side
    combine = the skew defense) with no Window and no join."""
    df = spark.createDataFrame(
        [("k", 1, "a", None, False, False)],
        "k string, lsn long, text string, tool string, _patch boolean, _del boolean",
    )
    out = patch_fold(df, ["k"], ["lsn"], ["text", "tool"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # struct-ordered max_by plans as SortAggregate (not hash-aggregable)
    # — the load-bearing property is the PARTIAL phase before the
    # exchange (map-side combine = the skew defense), same as lww_dedup
    assert "partial_max_by" in plan
    assert "Window" not in plan and "Join" not in plan