"""Sharded change feed (sources/sharded.py): per-shard offsets with no
global LSN, flattened to the engine's scalar-lsn contract.
"""

from __future__ import annotations

import pandas as pd

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.sources.sharded import ShardedLogSource
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

N_SHARDS = 4


def _sharded_log(cfg=SynthConfig(n_events=6_000, n_convs=200)) -> pd.DataFrame:
    """A key-partitioned feed: one conversation never spans shards;
    each shard's seq is its contiguous offset in original arrival
    order. The global lsn column is DROPPED — the feed has none."""
    log = generate_pandas(cfg).drop_duplicates(subset=["lsn"])
    log["shard"] = log["conv_id"].map(lambda c: hash(c) % N_SHARDS).astype("int32")
    log = log.sort_values("lsn", kind="mergesort")
    log["seq"] = log.groupby("shard").cumcount().astype("int64")
    return log.drop(columns=["lsn"]).reset_index(drop=True)


def _with_virtual(log: pd.DataFrame) -> pd.DataFrame:
    out = log.copy()
    out["lsn"] = out["seq"] * N_SHARDS + out["shard"]
    return out


def test_flattening_is_bijective_and_order_preserving():
    log = _with_virtual(_sharded_log())
    assert log["lsn"].is_unique
    for s, grp in log.groupby("shard"):
        g = grp.sort_values("seq")
        assert g["lsn"].is_monotonic_increasing
        assert (g["lsn"] % N_SHARDS == s).all()


def test_slice_equals_virtual_range_filter(spark, tmp_path):
    log = _sharded_log()
    p = str(tmp_path / "feed")
    spark.createDataFrame(log).write.parquet(p)
    src = ShardedLogSource(spark, p, N_SHARDS)
    lo_b, hi_b = src.lsn_bounds()
    virt = _with_virtual(log)
    for lo, hi in [(0, 37), (100, 101), (lo_b, hi_b + 1), (1234, 4321)]:
        got = sorted(r["lsn"] for r in src.slice(lo, hi).collect())
        exp = sorted(virt.loc[(virt["lsn"] >= lo) & (virt["lsn"] < hi), "lsn"])
        assert got == exp, (lo, hi)


def test_slice_pushes_raw_seq_bounds_to_scan(spark, tmp_path):
    log = _sharded_log()
    p = str(tmp_path / "feed")
    spark.createDataFrame(log).write.parquet(p)
    src = ShardedLogSource(spark, p, N_SHARDS)
    plan = src.slice(400, 800)._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(seq,100)" in plan and "LessThan(seq,200)" in plan


def test_vector_checkpoint_roundtrip():
    src = ShardedLogSource.__new__(ShardedLogSource)
    src.n = N_SHARDS
    # watermark 0: nothing consumed anywhere
    assert ShardedLogSource.vector_checkpoint(src, 0) == {s: -1 for s in range(4)}
    # watermark w: shard s consumed exactly the seqs with seq*n+s < w
    for w in [1, 5, 17, 100]:
        v = ShardedLogSource.vector_checkpoint(src, w)
        for s in range(N_SHARDS):
            applied = [q for q in range(w) if q * N_SHARDS + s < w]
            assert v[s] == (max(applied) if applied else -1), (w, s)


def test_engine_replays_sharded_feed_exactly_once(spark, tmp_path):
    log = _sharded_log()
    p = str(tmp_path / "feed")
    spark.createDataFrame(log).write.parquet(p)
    src = ShardedLogSource(spark, p, N_SHARDS)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    eng = ReplayEngine(
        spark, table, config=EngineConfig(batch_lsn_size=2500, lineage=False)
    )
    stats = eng.replay(src)  # duck-typed source: bounds discovered
    assert stats.batches_applied >= 2

    exp = expected_final_state(_with_virtual(log))
    assert_pdf_equal(table.read().toPandas(), exp, ["conv_id", "turn_idx"])

    again = eng.replay(src)
    assert again.batches_applied == 0 and again.batches_skipped >= 2
