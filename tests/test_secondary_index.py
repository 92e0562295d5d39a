"""Secondary value index (operators/secondary_index.py): lookups by a
payload column served from a maintained postings table — build,
incremental advance with retraction of stale postings, exactly-once
replay, and the pruned access path on both sides."""
from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.secondary_index import (
    create_secondary_index,
    load_secondary_index,
    secondary_index_sync,
    secondary_lookup,
)
from neosync_spark.schema import KEY_COLS, transcript_schema


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk(spark):
    path = tempfile.mkdtemp(prefix="ns_sidx_src_")
    return SnapshotTable.create(
        spark, path, transcript_schema(), key_cols=KEY_COLS, n_buckets=4
    )


def _mk_index(spark, src, col="tool", n_buckets=8):
    path = tempfile.mkdtemp(prefix="ns_sidx_idx_")
    return create_secondary_index(spark, path, src, col, n_buckets=n_buckets)


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("conv_id", "turn_idx", "tool").collect()
    )


def _expect(src, value):
    return _rows(src.read().filter(F.col("tool") == value))


def test_build_lookup_matches_filter(spark):
    src = _mk(spark)
    events = [
        (f"c{i}", j, "user", f"t{i}.{j}", ["search", "code", None][j % 3],
         1.0 + j, i * 10 + j, "insert")
        for i in range(12)
        for j in range(3)
    ]
    src.merge_cdc(_ev(spark, events), applied_range=(0, 1))
    idx = _mk_index(spark, src)
    to = src.manifest(refresh=True)["snapshot_id"]
    secondary_index_sync(src, idx, "tool", to_snapshot=to)
    for v in ("search", "code"):
        assert _rows(secondary_lookup(src, idx, "tool", v)) == _expect(src, v)
    # NULL values carry no posting; a missing value returns empty
    assert secondary_lookup(src, idx, "tool", "nope").count() == 0
    # postings rows == non-null values
    assert idx.read().count() == 24


def test_incremental_retracts_stale_postings(spark):
    src = _mk(spark)
    src.merge_cdc(
        _ev(spark, [
            ("a", 0, "user", "x", "search", 1.0, 1, "insert"),
            ("b", 0, "user", "y", "search", 1.0, 2, "insert"),
            ("c", 0, "user", "z", "code", 1.0, 3, "insert"),
            ("d", 0, "user", "w", None, 1.0, 4, "insert"),
        ]),
        applied_range=(0, 4),
    )
    idx = _mk_index(spark, src)
    s1 = src.manifest(refresh=True)["snapshot_id"]
    secondary_index_sync(src, idx, "tool", to_snapshot=s1)
    # value change, delete, NULL->value, value->NULL
    src.merge_cdc(
        _ev(spark, [
            ("a", 0, "user", "x", "code", 2.0, 5, "update"),    # search->code
            ("b", 0, "user", None, None, 2.0, 6, "delete"),      # row gone
            ("c", 0, "user", "z", None, 2.0, 7, "update"),       # code->NULL
            ("d", 0, "user", "w", "search", 2.0, 8, "update"),   # NULL->search
        ]),
        applied_range=(4, 8),
    )
    s2 = src.manifest(refresh=True)["snapshot_id"]
    secondary_index_sync(src, idx, "tool", to_snapshot=s2, from_snapshot=s1)
    assert _rows(secondary_lookup(src, idx, "tool", "search")) == _expect(
        src, "search"
    ) == [("d", 0, "search")]
    assert _rows(secondary_lookup(src, idx, "tool", "code")) == _expect(
        src, "code"
    ) == [("a", 0, "code")]
    # no dangling postings anywhere
    assert idx.read().count() == 2


def test_sync_replay_is_noop_and_reload(spark):
    src = _mk(spark)
    src.merge_cdc(
        _ev(spark, [("a", 0, "user", "x", "search", 1.0, 1, "insert")]),
        applied_range=(0, 1),
    )
    idx = _mk_index(spark, src)
    s1 = src.manifest(refresh=True)["snapshot_id"]
    i1 = secondary_index_sync(src, idx, "tool", to_snapshot=s1)
    i2 = secondary_index_sync(src, idx, "tool", to_snapshot=s1)
    assert i2.rows_written == 0
    assert i2.snapshot_id == i1.snapshot_id
    re = load_secondary_index(spark, idx.path)
    assert _rows(secondary_lookup(src, re, "tool", "search")) == [
        ("a", 0, "search")
    ]


def test_unchanged_value_survives_update(spark):
    # an update that does NOT change the indexed value must not race a
    # delete+insert at the same ordinal — the posting simply survives
    src = _mk(spark)
    src.merge_cdc(
        _ev(spark, [("a", 0, "user", "x", "search", 1.0, 1, "insert")]),
        applied_range=(0, 1),
    )
    idx = _mk_index(spark, src)
    s1 = src.manifest(refresh=True)["snapshot_id"]
    secondary_index_sync(src, idx, "tool", to_snapshot=s1)
    src.merge_cdc(
        _ev(spark, [("a", 0, "user", "x2", "search", 2.0, 2, "update")]),
        applied_range=(1, 2),
    )
    s2 = src.manifest(refresh=True)["snapshot_id"]
    secondary_index_sync(src, idx, "tool", to_snapshot=s2, from_snapshot=s1)
    assert _rows(secondary_lookup(src, idx, "tool", "search")) == [
        ("a", 0, "search")
    ]
    assert idx.read().count() == 1


def test_lookup_access_path_is_pruned(spark):
    src = _mk(spark)
    events = [
        (f"c{i}", 0, "user", f"t{i}", f"tool{i % 16}", 1.0, i, "insert")
        for i in range(64)
    ]
    src.merge_cdc(_ev(spark, events), applied_range=(0, 64))
    idx = _mk_index(spark, src, n_buckets=8)
    to = src.manifest(refresh=True)["snapshot_id"]
    secondary_index_sync(src, idx, "tool", to_snapshot=to)
    # index side: the value's hash bucket (+ blooms) beats a full scan
    full = idx.scan_stats()
    pruned = idx.scan_stats(key_equals={"tool": ["tool3"]})
    assert pruned["files_kept"] < full["files_kept"]
    # primary side: only the matching keys' buckets are read
    got = secondary_lookup(src, idx, "tool", "tool3")
    assert _rows(got) == _expect(src, "tool3")
    from neosync_spark.lakehouse import bucket_expr

    hit = {
        int(r[0])
        for r in src.read()
        .filter(F.col("tool") == "tool3")
        .select(bucket_expr("conv_id", 4))
        .collect()
    }
    assert len(hit) < 4  # the lookup provably skipped >=1 primary bucket


def test_key_column_and_unknown_column_rejected(spark):
    import pytest

    src = _mk(spark)
    with pytest.raises(ValueError):
        _mk_index(spark, src, col="conv_id")
    with pytest.raises(ValueError):
        _mk_index(spark, src, col="nope")
