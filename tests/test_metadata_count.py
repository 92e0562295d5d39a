"""metadata_count: count(*) served from manifest row labels, with the
surgical flag-column and LWW fallbacks."""

from __future__ import annotations

import pandas as pd

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema


def _mk(spark, path, n_buckets=4):
    return SnapshotTable.create(
        spark,
        str(path),
        transcript_schema(),
        key_cols=KEY_COLS,
        order_cols=["ts"],
        n_buckets=n_buckets,
    )


def _batch(spark, rows):
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf)


def _inserts(n, t0="2024-01-01 00:00:"):
    return [
        (i, "insert", f"c{i % 7}", i, "user", f"msg {i}", None,
         f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}")
        for i in range(n)
    ]


def test_insert_only_counts_from_metadata(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(_batch(spark, _inserts(50)), applied_range=(0, 50))
    got = t.metadata_count()
    assert got["rows"] == 50 == t.read().count()
    # delete-free files are footer-provable: zero scanning anywhere
    assert got["rows_metadata"] == 50
    assert got["files_scanned"] == 0 and got["buckets_lww"] == 0
    assert got["files_metadata"] > 0


def test_tombstones_counted_exactly(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(_batch(spark, _inserts(40)), applied_range=(0, 40))
    dels = [
        (100 + i, "delete", f"c{i % 7}", i, None, None, None,
         "2024-01-02 00:00:01")
        for i in range(10)
    ]
    t.merge_cdc(_batch(spark, dels), applied_range=(40, 60))
    got = t.metadata_count()
    assert got["rows"] == 30 == t.read().count()
    # mixed live/tombstone single-row-group files are unlabelable from
    # the footer — the flag-column scan covers them, never a full read
    assert got["buckets_lww"] == 0
    assert got["rows"] == got["rows_metadata"] or got["files_scanned"] > 0


def test_expired_tombstones_restore_pure_metadata_path(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(_batch(spark, _inserts(40)), applied_range=(0, 40))
    dels = [
        (100 + i, "delete", f"c{i % 7}", i, None, None, None,
         "2024-01-02 00:00:01")
        for i in range(10)
    ]
    t.merge_cdc(_batch(spark, dels), applied_range=(40, 60))
    t.compact(expire_tombstones_before="2030-01-01 00:00:00")
    got = t.metadata_count()
    assert got["rows"] == 30 == t.read().count()
    assert got["files_scanned"] == 0 and got["buckets_lww"] == 0
    assert got["rows_metadata"] == 30


def test_mor_delta_buckets_fall_back_to_lww(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(_batch(spark, _inserts(30)), applied_range=(0, 30))
    ups = [
        (200 + i, "update", f"c{i % 7}", i, "user", f"edit {i}", None,
         "2024-01-03 00:00:01")
        for i in range(8)
    ]
    t.merge_cdc(_batch(spark, ups), applied_range=(30, 45), mode="mor")
    got = t.metadata_count()
    assert got["rows"] == 30 == t.read().count()
    assert got["buckets_lww"] > 0  # delta buckets took the LWW path
    # compaction folds deltas -> back to (at worst) flag scans
    t.compact()
    got2 = t.metadata_count()
    assert got2["rows"] == 30 and got2["buckets_lww"] == 0


def test_time_travel_count(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    i1 = t.merge_cdc(_batch(spark, _inserts(20)), applied_range=(0, 20))
    t.merge_cdc(_batch(spark, _inserts(35)[20:]), applied_range=(20, 40))
    assert t.metadata_count(i1.snapshot_id)["rows"] == 20
    assert t.metadata_count()["rows"] == 35


def test_pre_label_manifest_falls_back(spark, tmp_path):
    # simulate an old table: strip the row labels from the manifest
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(_batch(spark, _inserts(25)), applied_range=(0, 25))
    import json
    import os

    mdir = os.path.join(str(tmp_path / "t"), "metadata")
    heads = sorted(
        (f for f in os.listdir(mdir)
         if f.startswith("snap-") and f.endswith(".json")),
        key=lambda f: int(f[len("snap-"):-len(".json")]),
    )
    p = os.path.join(mdir, heads[-1])
    m = json.load(open(p))
    for entries in m["files"].values():
        if isinstance(entries, list):
            for e in entries:
                e.pop("rows", None)
                e.pop("live_rows", None)
    json.dump(m, open(p, "w"))
    t2 = SnapshotTable.load(spark, str(tmp_path / "t"))
    got = t2.metadata_count()
    assert got["rows"] == 25
    assert got["files_scanned"] > 0  # flag-column scan, not LWW
    assert got["buckets_lww"] == 0


def test_random_op_interleave_count_always_exact(spark, tmp_path):
    # randomized COW/MoR merges, deletes, compactions: after every
    # commit the three-tier count equals the full read
    import random

    rng = random.Random(7)
    t = _mk(spark, tmp_path / "t")
    lsn = 0
    live_keys = set()
    for step in range(6):
        rows = []
        for _ in range(rng.randint(5, 25)):
            k = (f"c{rng.randint(0, 9)}", rng.randint(0, 5))
            if k in live_keys and rng.random() < 0.3:
                rows.append((lsn, "delete", k[0], k[1], None, None, None,
                             f"2024-01-0{step + 1} 00:00:01"))
                live_keys.discard(k)
            else:
                rows.append((lsn, "insert", k[0], k[1], "user",
                             f"text {lsn}", None,
                             f"2024-01-0{step + 1} 00:00:01"))
                live_keys.add(k)
            lsn += 1
        mode = rng.choice(["cow", "mor"])
        t.merge_cdc(
            _batch(spark, rows), applied_range=(lsn - len(rows), lsn),
            mode=mode,
        )
        if rng.random() < 0.4:
            t.compact()
        got = t.metadata_count()
        assert got["rows"] == t.read().count(), (step, mode, got)
    t.compact(expire_tombstones_before=f"2024-01-0{7} 00:00:00")
    got = t.metadata_count()
    assert got["rows"] == t.read().count() == len(live_keys)
    assert got["files_scanned"] == 0 and got["buckets_lww"] == 0
