"""Zone-map (per-file min/max) scan pruning: COW per-file, MoR
bucket-granular with the order-col lower-bound refinement; pruned reads
are always exactly read().filter(pred)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from .test_lakehouse import _batch, _mk


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_mor_tail_read_prunes_old_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for e in range(5):
        rows = [
            (e * 10 + i, "insert" if e == 0 else "update", f"k{i}", 0,
             "user", f"v{e}", None, f"2026-0{e + 1}-01")
            for i in range(6)
        ]
        t.merge_cdc(_batch(spark, rows), applied_range=(e * 10, e * 10 + 9), mode="mor")

    full = t.scan_stats({})
    # ts is the PRIMARY LWW order column -> lower-bound per-file prune
    pruned = t.scan_stats({"ts": (_ts("2026-05-01"), None)})
    assert pruned["files_total"] == full["files_total"]
    # only the last epoch's delta files survive the lower bound
    assert pruned["files_kept"] < full["files_kept"] / 2
    got = t.read(stats_filter={"ts": (_ts("2026-05-01"), None)})
    assert got.count() == 6 and {r["text"] for r in got.collect()} == {"v4"}

    # _lsn is only the LWW tie-breaker: its lower bound must NOT prune
    # per-file in MoR buckets (unsound — see the stale-winner test),
    # but the filtered read is still exactly correct
    lsn_pruned = t.scan_stats({"_lsn": (40, None)})
    assert lsn_pruned["files_kept"] == full["files_kept"]
    got2 = t.read(stats_filter={"_lsn": (40, None)}, internal=True)
    want2 = t.read(internal=True).filter(F.col("_lsn") >= 40)
    assert got2.count() == want2.count() == 6
    # LWW winners unaffected by the machinery
    assert {r["text"] for r in t.read().collect()} == {"v4"}


def test_lsn_lower_bound_never_promotes_stale_winner(spark, tmp_path):
    """Review-confirmed soundness case: a late-arriving event carries
    (low ts, HIGH lsn). Pruning the old delta file on an _lsn lower
    bound would drop the true (high-ts, low-lsn) winner and let the
    high-lsn LOSER surface. The fix keeps tie-breaker columns
    bucket-granular, so the pruned read equals the filtered read."""
    t = _mk(spark, tmp_path / "t")
    # commit 1: the WINNER (newest ts, low lsn)
    t.merge_cdc(
        _batch(spark, [(1, "insert", "k", 0, "user", "winner", None, "2026-06-01")]),
        applied_range=(0, 2),
        mode="mor",
    )
    # commit 2: late-arriving older event (old ts, high lsn) — a loser
    t.merge_cdc(
        _batch(spark, [(10, "update", "k", 0, "user", "stale", None, "2026-01-01")]),
        applied_range=(2, 11),
        mode="mor",
    )
    got = t.read(stats_filter={"_lsn": (5, None)}, internal=True).collect()
    want = t.read(internal=True).filter(F.col("_lsn") >= 5).collect()
    assert [r["text"] for r in got] == [r["text"] for r in want] == []
    assert {r["text"] for r in t.read().collect()} == {"winner"}


def test_mor_upper_bound_stays_sound(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _batch(spark, [(1, "insert", "x", 0, "user", "old", None, "2026-01-01")]),
        applied_range=(0, 1),
    )
    t.merge_cdc(
        _batch(spark, [(2, "update", "x", 0, "user", "new", None, "2026-06-01")]),
        applied_range=(1, 2),
        mode="mor",
    )
    # upper-bounded filter: the newer delta must still suppress the old
    # row (bucket-granular keep) — NOT resurface it as an as-of read
    got = t.read(stats_filter={"ts": (_ts("2026-01-01"), _ts("2026-01-31"))})
    assert got.count() == 0
    got2 = t.read(stats_filter={"ts": (_ts("2026-05-01"), None)})
    assert [r["text"] for r in got2.collect()] == ["new"]


def test_cow_pruned_read_equals_filtered_read(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for ci, (day, pref) in enumerate(
        [("2026-01-01", "a"), ("2026-02-01", "b"), ("2026-03-01", "c")]
    ):
        rows = [
            (ci * 100 + i, "insert", f"{pref}{i}", 0, "user", f"t{i}", None, day)
            for i in range(20)
        ]
        t.merge_cdc(_batch(spark, rows), applied_range=(ci * 100, ci * 100 + 99))
    flt = {"ts": (_ts("2026-02-01"), _ts("2026-02-28"))}
    got = t.read(stats_filter=flt).toPandas()
    want = (
        t.read()
        .filter((F.col("ts") >= "2026-02-01") & (F.col("ts") <= "2026-02-28"))
        .toPandas()
    )
    assert len(got) == len(want) == 20
    assert sorted(got["conv_id"]) == sorted(want["conv_id"])


def test_stats_survive_manifest_roundtrip_and_missing_stats_kept(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _batch(spark, [(1, "insert", "a", 0, "user", "x", None, "2026-01-01")]),
        applied_range=(0, 1),
    )
    m = t.manifest(refresh=True)
    entries = [e for v in m["files"].values() for e in v]
    assert all("stats" in e for e in entries)
    assert all("_lsn" in e["stats"] and "ts" in e["stats"] for e in entries)
    # a file entry WITHOUT stats (pre-feature commit) is conservatively kept
    import json
    import os

    for e in entries:
        e.pop("stats")
    mpath = os.path.join(str(tmp_path / "t"), "metadata", f"snap-{m['snapshot_id']}.json")
    with open(mpath, "w") as f:
        json.dump(m, f)
    t._manifest = None
    assert t.scan_stats({"ts": (_ts("2030-01-01"), None)})["files_kept"] == len(entries)
    assert t.read(stats_filter={"ts": (_ts("2030-01-01"), None)}).count() == 0


def test_clustered_compaction_enables_point_lookup_pruning(spark, tmp_path):
    """compact(sort_by_key, max_records_per_file): each split file
    covers a contiguous key range, so a conversation point-lookup opens
    ~one file per bucket instead of the whole bucket."""
    t = _mk(spark, tmp_path / "t")
    rows = [
        (i, "insert", f"conv-{i % 40:03d}", i // 40, "user", f"x{i}", None,
         "2026-01-01")
        for i in range(400)
    ]
    t.merge_cdc(_batch(spark, rows), applied_range=(0, 400), mode="mor")
    t.compact(sort_by_key=True, max_records_per_file=50)

    total = t.scan_stats({})["files_total"]
    point = t.scan_stats({"conv_id": ("conv-007", "conv-007")})
    assert total >= 8  # the split actually produced multiple files
    assert point["files_kept"] <= max(2, total // 3)
    got = t.read(stats_filter={"conv_id": ("conv-007", "conv-007")})
    assert got.count() == 10
    assert {r["conv_id"] for r in got.collect()} == {"conv-007"}
