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


def test_patch_requires_raw_source(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    b = _patch_batch(
        spark, [(1, "insert", "c", 0, "u", "x", None, "2026-01-01 00:00:01")]
    )
    with pytest.raises(ValueError, match="patch_ops"):
        t.merge_cdc(b, mode="cow", patch_ops=True, source_is_raw=False)
    with pytest.raises(ValueError, match="patch_ops"):
        t.prepare_delta(b, source_is_raw=False, patch_ops=True)


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

# ---------- MoR patch deltas: raw storage, read-time fold ----------


def test_mor_patch_basic_and_compact(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _patch_batch(spark, [
            (1, "insert", "c1", 0, "user", "hello", "search", "2026-01-01 00:00:01"),
        ]),
        applied_range=(0, 10), mode="mor", patch_ops=True, source_is_raw=True,
    )
    t.merge_cdc(
        _patch_batch(spark, [
            (11, "patch", "c1", 0, None, None, "browser", "2026-01-01 00:00:03"),
            (12, "patch", "ghost", 9, None, "orphan", None, "2026-01-01 00:00:04"),
        ]),
        applied_range=(10, 20), mode="mor", patch_ops=True, source_is_raw=True,
    )
    assert _state(t) == {("c1", 0): ("user", "hello", "browser")}
    # manifest flags the patch deltas
    m = t.manifest(refresh=True)
    assert any(
        e.get("patches") for es in m["files"].values() for e in es
    )
    # compaction folds patches into clean full rows
    t.compact()
    m2 = t.manifest(refresh=True)
    assert not any(
        e.get("patches") for es in m2["files"].values() for e in es
    )
    assert _state(t) == {("c1", 0): ("user", "hello", "browser")}


def test_mor_patch_out_of_order_across_batches(spark, tmp_path):
    """The case COW patch folding cannot express: a LATE full image
    (older ts) lands in a later batch; raw MoR storage + read-time fold
    still yields the full-history answer."""
    t = _mk(spark, tmp_path / "t")
    # batch 1: full@ts1 then patch(tool)@ts5
    t.merge_cdc(
        _patch_batch(spark, [
            (1, "insert", "c", 0, "user", "a", None, "2026-01-01 00:00:01"),
            (2, "patch", "c", 0, None, None, "T", "2026-01-05 00:00:00"),
        ]),
        applied_range=(0, 10), mode="mor", patch_ops=True, source_is_raw=True,
    )
    # batch 2: late full image @ts3 (between them) — owns text, loses tool
    t.merge_cdc(
        _patch_batch(spark, [
            (11, "update", "c", 0, "user", "b", None, "2026-01-03 00:00:00"),
        ]),
        applied_range=(10, 20), mode="mor", patch_ops=True, source_is_raw=True,
    )
    assert _state(t) == {("c", 0): ("user", "b", "T")}


def test_mor_patch_random_replay_matches_oracle(spark, tmp_path):
    """Randomized history split into 4 MoR batches BY LSN while ts is
    shuffled (cross-batch disorder): read-time fold == full-history
    sequential oracle ordered by (ts, lsn)."""
    import random

    rng = random.Random(21)
    cols = ["role", "text", "tool"]
    keys = [(f"c{i}", j) for i in range(5) for j in range(2)]
    events = []
    # ts deliberately NOT monotone with lsn
    ts_pool = [f"2026-01-01 00:{m // 60:02d}:{m % 60:02d}" for m in rng.sample(range(3600), 160)]
    for lsn in range(160):
        k = rng.choice(keys)
        r = rng.random()
        if r < 0.45:
            op = "insert"
            vals = [f"{c}{lsn}" if rng.random() < 0.8 else None for c in cols]
        elif r < 0.6:
            op, vals = "delete", [None] * 3
        else:
            op = "patch"
            vals = [f"{c}{lsn}" if rng.random() < 0.4 else None for c in cols]
        events.append((lsn, op, k[0], k[1], vals[0], vals[1], vals[2], ts_pool[lsn]))

    t = _mk(spark, tmp_path / "t")
    for i in range(4):
        chunk = [e for e in events if i * 40 <= e[0] < (i + 1) * 40]
        t.merge_cdc(
            _patch_batch(spark, chunk), applied_range=(i * 40, (i + 1) * 40),
            mode="mor", patch_ops=True, source_is_raw=True,
        )

    # oracle: sequential interpreter over (ts, lsn)-ordered history
    state: dict = {}
    for (l, op, cid, ti, role, text, tool, _ts) in sorted(
        events, key=lambda e: (e[7], e[0])
    ):
        k = (cid, ti)
        if op == "delete":
            state[k] = None
        elif op == "patch":
            cur = state.get(k)
            if cur is not None:
                state[k] = tuple(
                    n if n is not None else c
                    for n, c in zip((role, text, tool), cur)
                )
        else:
            state[k] = (role, text, tool)
    want = {k: v for k, v in state.items() if v is not None}
    assert _state(t) == want
    # compaction preserves it
    t.compact()
    assert _state(t) == want


def test_mor_patch_lower_bound_prune_stays_exact(spark, tmp_path):
    """A patch file wholly below a ts lower bound still owns a column
    of a winner above the bound — patch buckets must not tail-prune."""
    import datetime

    from pyspark.sql import functions as F

    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _patch_batch(spark, [
            (1, "insert", "c", 0, "user", "base", "tool0", "2026-01-01 00:00:01"),
            (2, "patch", "c", 0, None, "patched", None, "2026-01-02 00:00:00"),
        ]),
        applied_range=(0, 10), mode="mor", patch_ops=True, source_is_raw=True,
    )
    t.merge_cdc(
        _patch_batch(spark, [
            (11, "patch", "c", 0, None, None, "tool9", "2026-06-01 00:00:00"),
        ]),
        applied_range=(10, 20), mode="mor", patch_ops=True, source_is_raw=True,
    )
    cutoff = datetime.datetime(2026, 5, 1)
    got = t.read(stats_filter={"ts": (cutoff, None)}).collect()
    # winner's fold ts is the last patch's (>= cutoff): row passes the
    # predicate WITH columns owned by the older (prunable-looking) files
    assert len(got) == 1
    r = got[0]
    assert (r["text"], r["tool"]) == ("patched", "tool9")
    want = t.read().filter(F.col("ts") >= F.lit(cutoff)).collect()
    assert [(x["text"], x["tool"]) for x in want] == [("patched", "tool9")]


def test_mor_patch_pipelined_engine(spark, tmp_path):
    """Pipelined MoR commits with patch_ops through the engine: final
    state equals the serial COW-free oracle."""
    from neosync_spark.engine import EngineConfig, ReplayEngine

    rows = [
        (0, "insert", "c", 0, "user", "v0", None, "2026-01-01 00:00:01"),
        (1, "patch", "c", 0, None, "v1", None, "2026-01-01 00:00:02"),
        (2, "patch", "c", 0, None, None, "t1", "2026-01-01 00:00:03"),
        (3, "insert", "d", 1, "user", "w0", None, "2026-01-01 00:00:04"),
        (4, "delete", "d", 1, None, None, None, "2026-01-01 00:00:05"),
        (5, "patch", "d", 1, None, "zombie", None, "2026-01-01 00:00:06"),
    ]
    df = _patch_batch(spark, rows)
    t = _mk(spark, tmp_path / "t")
    eng = ReplayEngine(
        spark, t,
        config=EngineConfig(
            batch_lsn_size=2, lineage=False, merge_mode="mor",
            patch_ops=True, compact_deltas_over=None,
        ),
    )

    def slicer(lo, hi):
        from pyspark.sql import functions as F

        return df.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))

    eng.replay(slicer, lsn_lo=0, lsn_hi=5, pipeline_batches=3)
    assert _state(t) == {("c", 0): ("user", "v1", "t1")}


def test_cow_patch_with_transform_no_double_transform(spark, tmp_path):
    """A value-dependent transform must never re-run over target-derived
    column values when a later source patch wins the key: raw source
    events are transformed BEFORE the fold (f(f(x)) != f(x) guard)."""
    from pyspark.sql import functions as F

    def tx(df):
        return df.withColumn(
            "text",
            F.when(
                F.col("text").isNotNull(), F.concat(F.lit("X"), F.col("text"))
            ),
        )

    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _patch_batch(spark, [
            (1, "insert", "c", 0, "user", "secret", None, "2026-01-01 00:00:01"),
        ]),
        applied_range=(0, 10), patch_ops=True, source_is_raw=True, transform=tx,
    )
    assert _state(t) == {("c", 0): ("user", "Xsecret", None)}
    # batch 2: patch touches ONLY tool — text must stay singly-transformed
    t.merge_cdc(
        _patch_batch(spark, [
            (11, "patch", "c", 0, None, None, "browser", "2026-01-01 00:00:02"),
        ]),
        applied_range=(10, 20), patch_ops=True, source_is_raw=True, transform=tx,
    )
    assert _state(t) == {("c", 0): ("user", "Xsecret", "browser")}
    # a patch that DOES set text gets transformed exactly once
    t.merge_cdc(
        _patch_batch(spark, [
            (21, "patch", "c", 0, None, "fresh", None, "2026-01-01 00:00:03"),
        ]),
        applied_range=(20, 30), patch_ops=True, source_is_raw=True, transform=tx,
    )
    assert _state(t) == {("c", 0): ("user", "Xfresh", "browser")}


def test_patch_events_survive_quarantine_filter(spark, tmp_path):
    # regression: quarantine's valid-op set must include 'patch' when
    # patch_ops is on — otherwise every partial image is quarantined
    import os

    from neosync_spark.engine import EngineConfig, ReplayEngine

    t = _mk(spark, tmp_path / "t")
    eng = ReplayEngine(
        spark, t,
        config=EngineConfig(
            batch_lsn_size=100, lineage=False, quarantine=True,
            patch_ops=True,
        ),
    )
    batch = _patch_batch(spark, [
        (1, "insert", "c1", 0, "user", "hello", "search", "2026-01-01 00:00:01"),
        (2, "patch", "c1", 0, None, None, "browser", "2026-01-01 00:00:02"),
        (3, "bogus", "c1", 1, "user", "poison", None, "2026-01-01 00:00:03"),
    ])
    eng.replay(
        lambda lo, hi: batch.filter(
            (batch.lsn >= lo) & (batch.lsn < hi)
        ),
        lsn_lo=0, lsn_hi=99,
    )
    assert _state(t) == {("c1", 0): ("user", "hello", "browser")}
    qdir = os.path.join(t.path, "metadata", "quarantine")
    q = spark.read.parquet(qdir)
    assert q.count() == 1 and q.collect()[0]["op"] == "bogus"
