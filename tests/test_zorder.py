"""Z-order clustering: Morton interleave correctness, compaction
integration, multi-dimension zone-map pruning, soundness (pruned read
== filtered read)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.zorder import (
    zorder_bounds,
    zorder_expr,
    zorder_sort_key,
)
from neosync_spark.schema import KEY_COLS, transcript_schema


def _ts(day, hour=0):
    return datetime.datetime(2026, 1, day, hour)


def _table(spark, path, n_rows=512, n_buckets=1):
    t = SnapshotTable.create(
        spark, str(path), transcript_schema(),
        key_cols=KEY_COLS, order_cols=["ts"], n_buckets=n_buckets,
    )
    rows = []
    for i in range(n_rows):
        rows.append(
            (i, "insert", f"c{i}", i % 16, "user", f"t{i}", None,
             _ts(1 + (i * 7) % 28, (i * 5) % 24))
        )
    pdf = pd.DataFrame(
        rows,
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    t.merge_cdc(spark.createDataFrame(pdf), applied_range=(0, n_rows))
    return t


def test_zorder_expr_interleave(spark):
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3)], "a int, b int"
    )
    bounds = {"a": [0.0, 1.0, 2.0], "b": [0.0, 1.0, 2.0]}  # 2 bits each
    out = df.select("a", "b", zorder_expr(df, bounds, bits=2).alias("z")).collect()
    z = {(r["a"], r["b"]): r["z"] for r in out}
    # bucket == value here; a is column 0 (even bits), b column 1 (odd)
    assert z[(0, 0)] == 0
    assert z[(3, 0)] == 0b0101
    assert z[(0, 3)] == 0b1010
    assert z[(3, 3)] == 0b1111


def test_zorder_null_and_string_handling(spark):
    df = spark.createDataFrame([(None,), (5,)], "a int")
    b = zorder_bounds(df, ["a"], bits=1)
    out = df.select(zorder_expr(df, b, bits=1).alias("z")).collect()
    assert sorted(r["z"] for r in out) == [0, 0]  # null -> bucket 0; one cut
    sdf = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ValueError, match="string"):
        zorder_bounds(sdf, ["s"])
    with pytest.raises(ValueError, match="bits"):
        zorder_bounds(df, ["a"], bits=0)


def test_zorder_compact_preserves_rows(spark, tmp_path):
    t = _table(spark, tmp_path / "t", n_rows=128, n_buckets=2)
    before = sorted(map(tuple, t.read().collect()))
    t.compact(buckets=[0, 1], zorder_cols=["turn_idx", "ts"], max_records_per_file=32)
    after = sorted(map(tuple, t.read().collect()))
    assert before == after


def test_zorder_exclusive_with_sort_by_key(spark, tmp_path):
    t = _table(spark, tmp_path / "t", n_rows=16)
    with pytest.raises(ValueError, match="exclusive"):
        t.compact(buckets=[0], sort_by_key=True, zorder_cols=["ts"])


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """After z-order compaction with small files, a range filter on
    EITHER clustered column must skip files — a plain key sort only
    serves its leading column."""
    t = _table(spark, tmp_path / "t", n_rows=512, n_buckets=1)
    t.compact(
        buckets=[0], zorder_cols=["turn_idx", "ts"], max_records_per_file=32,
        zorder_bits=4,
    )
    full = t.scan_stats({})
    assert full["files_total"] >= 8  # small files actually split

    by_turn = t.scan_stats({"turn_idx": (0, 2)})
    by_ts = t.scan_stats({"ts": (_ts(1), _ts(7))})
    assert by_turn["files_kept"] < full["files_total"] / 2
    assert by_ts["files_kept"] < full["files_total"] / 2

    # soundness on both dimensions: pruned read == filtered read
    got_t = t.read(stats_filter={"turn_idx": (0, 2)})
    want_t = t.read().filter(F.col("turn_idx").between(0, 2))
    assert sorted(map(tuple, got_t.collect())) == sorted(
        map(tuple, want_t.collect())
    )
    got_s = t.read(stats_filter={"ts": (_ts(1), _ts(7))})
    want_s = t.read().filter(F.col("ts").between(_ts(1), _ts(7)))
    assert sorted(map(tuple, got_s.collect())) == sorted(
        map(tuple, want_s.collect())
    )


def test_zorder_stats_cols_persist_for_future_commits(spark, tmp_path):
    """The clustered columns join the manifest's stats_cols, so later
    merges keep recording their zone maps."""
    t = _table(spark, tmp_path / "t", n_rows=64, n_buckets=1)
    t.compact(buckets=[0], zorder_cols=["turn_idx", "ts"], max_records_per_file=16)
    m = t.manifest(refresh=True)
    assert "turn_idx" in m["stats_cols"] and "ts" in m["stats_cols"]
    # a post-compact merge records turn_idx stats in its new files
    pdf = pd.DataFrame(
        [(1000, "insert", "z1", 3, "user", "x", None, _ts(20))],
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    t.merge_cdc(spark.createDataFrame(pdf), applied_range=(1000, 1001))
    m2 = t.manifest(refresh=True)
    newest = [
        e for es in m2["files"].values() for e in es
        if e.get("stats") and "turn_idx" in e["stats"]
    ]
    assert newest


def test_zorder_sort_key_deterministic(spark):
    df = spark.createDataFrame(
        [(i, float(i * 3 % 17)) for i in range(100)], "a int, v double"
    )
    k1 = df.select(zorder_sort_key(df, ["a", "v"], bits=3).alias("z")).collect()
    k2 = df.select(zorder_sort_key(df, ["a", "v"], bits=3).alias("z")).collect()
    assert [r["z"] for r in k1] == [r["z"] for r in k2]


def test_zorder_default_targets_all_buckets_on_cow(spark, tmp_path):
    """An explicit clustering request must not silently no-op on a
    fully-COW table (no deltas): buckets=None then means every bucket."""
    t = _table(spark, tmp_path / "t", n_rows=64, n_buckets=2)
    before = sorted(map(tuple, t.read().collect()))
    info = t.compact(zorder_cols=["turn_idx", "ts"], max_records_per_file=16)
    assert info is not None
    assert sorted(map(tuple, t.read().collect())) == before
    assert t.scan_stats({})["files_total"] > 2
