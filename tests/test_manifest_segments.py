"""Content-addressed manifest file-list segments — per-commit metadata
bytes must be O(changed buckets), not O(total table files), and
segments must GC with snapshot expiry. The Iceberg manifest-list
analog for the one metadata cost that grows with table size."""
from __future__ import annotations

import glob
import json
import os
import tempfile

from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk(spark, n_buckets=4):
    return SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="ns_seg_"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=n_buckets,
    )


def _wide_batch(spark, i, width=16):
    return _ev(spark, [
        (f"c{j}", i, "user", f"t{i}-{j}", None, 1.0 + i, i * 100 + j, "insert")
        for j in range(width)
    ])


def _raw(t, sid=None):
    sid = t.manifest(refresh=True)["snapshot_id"] if sid is None else sid
    with open(os.path.join(t.path, "metadata", f"snap-{sid}.json")) as f:
        return json.load(f)


def _segs(t):
    return glob.glob(os.path.join(t.path, "metadata", "seg-*.json"))


def test_small_tables_stay_inline(spark):
    t = _mk(spark)
    t.merge_cdc(_wide_batch(spark, 0, width=4), applied_range=(0, 1))
    raw = _raw(t)
    assert all(isinstance(v, list) for v in raw["files"].values())
    assert not _segs(t)


def test_pointerized_resolved_and_equal(spark):
    t = _mk(spark)
    for i in range(12):
        t.merge_cdc(_wide_batch(spark, i), applied_range=(i, i + 1), mode="mor")
    raw = _raw(t)
    assert any(isinstance(v, dict) and "@seg" in v for v in raw["files"].values())
    # resolved view equals what a fresh loader sees, and reads are right
    m1 = t.manifest(refresh=True)["files"]
    m2 = SnapshotTable.load(spark, t.path).manifest()["files"]
    assert {b: [e["path"] for e in v] for b, v in m1.items()} == \
           {b: [e["path"] for e in v] for b, v in m2.items()}
    assert t.read().count() == 12 * 16


def test_commit_metadata_bytes_are_o_changed_buckets(spark):
    t = _mk(spark)
    for i in range(12):
        t.merge_cdc(_wide_batch(spark, i), applied_range=(i, i + 1), mode="mor")
    head_raw = _raw(t)
    refs_before = {
        v["@seg"] for v in head_raw["files"].values()
        if isinstance(v, dict) and "@seg" in v
    }
    segs_before = set(_segs(t))
    # one-key commit: only that key's bucket may mint a new segment
    t.merge_cdc(
        _ev(spark, [("c0", 99, "user", "new", None, 50.0, 9999, "insert")]),
        applied_range=(50, 51), mode="mor",
    )
    raw2 = _raw(t)
    refs_after = {
        v["@seg"] for v in raw2["files"].values()
        if isinstance(v, dict) and "@seg" in v
    }
    assert len(refs_before & refs_after) >= len(refs_before) - 1
    assert len(set(_segs(t)) - segs_before) <= 1
    # the snapshot file itself is a fraction of the full file list
    snap_bytes = os.path.getsize(
        os.path.join(t.path, "metadata", f"snap-{raw2['snapshot_id']}.json")
    )
    inline_bytes = len(json.dumps(t.manifest(refresh=True)["files"]))
    assert snap_bytes < inline_bytes / 2


def test_expire_gcs_unreferenced_segments(spark):
    t = _mk(spark)
    for i in range(12):
        t.merge_cdc(_wide_batch(spark, i), applied_range=(i, i + 1), mode="mor")
    assert len(_segs(t)) > 4
    out = t.expire_snapshots(keep_last=1)
    assert out["removed_segments"] > 0
    kept = {
        v["@seg"] for v in _raw(t)["files"].values()
        if isinstance(v, dict) and "@seg" in v
    }
    assert {os.path.basename(p) for p in _segs(t)} == kept
    assert t.read().count() == 12 * 16


def test_rollback_and_time_travel_resolve_segments(spark):
    t = _mk(spark)
    for i in range(10):
        t.merge_cdc(_wide_batch(spark, i), applied_range=(i, i + 1), mode="mor")
    pinned = t.manifest(refresh=True)["snapshot_id"]
    t.merge_cdc(_wide_batch(spark, 10), applied_range=(10, 11), mode="mor")
    assert t.read(snapshot_id=pinned).count() == 10 * 16
    t.rollback(pinned)
    assert t.read().count() == 10 * 16


def test_hand_rewritten_inline_manifest_still_reads(spark):
    # the escape hatch tests rely on: a snap file whose files are plain
    # inline lists (no pointers) must keep loading forever
    t = _mk(spark)
    for i in range(12):
        t.merge_cdc(_wide_batch(spark, i), applied_range=(i, i + 1), mode="mor")
    m = t.manifest(refresh=True)
    sid = m["snapshot_id"]
    with open(os.path.join(t.path, "metadata", f"snap-{sid}.json"), "w") as f:
        json.dump(m, f)
    t._manifest = None
    t._seg_cache.clear()
    assert SnapshotTable.load(spark, t.path).read().count() == 12 * 16


def test_fsck_reports_dangling_segment(spark):
    t = _mk(spark)
    for i in range(12):
        t.merge_cdc(_wide_batch(spark, i), applied_range=(i, i + 1), mode="mor")
    head_refs = {
        v["@seg"] for v in _raw(t)["files"].values()
        if isinstance(v, dict) and "@seg" in v
    }
    victim = os.path.join(t.path, "metadata", sorted(head_refs)[0])
    os.remove(victim)
    t._seg_cache.clear()
    t._seg_parsed.clear()
    t._manifest = None
    out = t.verify_files()
    assert out.get("metadata_damage") is True
    assert any(
        d["reason"] == "missing manifest segment" for d in out["damaged"]
    )
    # recovery path: a prior snapshot whose segments survive still reads
    raw = json.load(open(glob.glob(
        os.path.join(t.path, "metadata", "snap-*.json"))[0]))
    # (the victim may be referenced by several snapshots; the recovery
    # contract is rollback-to-intact + tail re-replay, asserted by the
    # rollback tests — here we only pin the detection shape)
    assert raw["snapshot_id"] >= 0
