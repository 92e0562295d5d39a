"""Write-audit-publish branches: staged commits are invisible to main,
publish is an audited atomic fast-forward, expire is branch-aware.

Analog: Iceberg branch refs + fast_forward (the reference has no
staging concept; its sync writes land directly — this is the safety
layer a 10^10-event ingest wants in front of the published table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neosync_spark.lakehouse import (
    BranchAuditError,
    CommitConflictError,
    SnapshotTable,
)

from .test_lakehouse import _batch, _mk


def test_staged_commits_invisible_until_publish(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _batch(spark, [(1, "insert", "c1", 0, "user", "hello", None, "2026-01-01")]),
        applied_range=(0, 10),
    )
    t.create_branch("stage")
    b = t.branch("stage")
    b.merge_cdc(
        _batch(spark, [(11, "insert", "c2", 0, "user", "staged", None, "2026-01-02")]),
        applied_range=(10, 20),
    )
    # main readers see only the published snapshot
    assert t.read().count() == 1
    assert not t.is_applied(10, 20)
    # the branch view sees both
    assert b.read().count() == 2
    assert b.is_applied(0, 10) and b.is_applied(10, 20)

    head = t.publish_branch("stage")
    assert t.manifest(refresh=True)["snapshot_id"] == head
    assert t.read().count() == 2
    # the staged lsn range published atomically with the data: a replay
    # of the same range on main is now a ledger no-op (exactly-once)
    info = t.merge_cdc(
        _batch(spark, [(11, "insert", "c2", 0, "user", "dup", None, "2026-01-02")]),
        applied_range=(10, 20),
    )
    assert info.rows_written == 0
    assert "stage" not in t.list_branches()


def test_failed_audit_blocks_publish_keeps_branch(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.create_branch("stage")
    b = t.branch("stage")
    b.merge_cdc(
        _batch(spark, [(1, "insert", "c1", 0, None, "bad", None, "2026-01-01")]),
        applied_range=(0, 10),
    )
    audit = lambda df: df.filter(F.col("role").isNull()).count()  # noqa: E731
    with pytest.raises(BranchAuditError):
        t.publish_branch("stage", audit=audit)
    # main untouched, branch intact for repair
    assert t.read().count() == 0
    assert "stage" in t.list_branches()
    # repair on the branch, re-audit, publish
    b.merge_cdc(
        _batch(spark, [(2, "update", "c1", 0, "user", "fixed", None, "2026-01-02")]),
        applied_range=(10, 20),
    )
    t.publish_branch("stage", audit=audit)
    rows = t.read().collect()
    assert [r["role"] for r in rows] == ["user"]


def test_divergent_publish_conflicts(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge_cdc(
        _batch(spark, [(1, "insert", "c1", 0, "user", "a", None, "2026-01-01")]),
        applied_range=(0, 10),
    )
    t.create_branch("late")
    b = t.branch("late")
    b.merge_cdc(
        _batch(spark, [(21, "insert", "c3", 0, "user", "c", None, "2026-01-03")]),
        applied_range=(20, 30),
    )
    # main advances after the fork -> branch base is stale
    t.merge_cdc(
        _batch(spark, [(11, "insert", "c2", 0, "user", "b", None, "2026-01-02")]),
        applied_range=(10, 20),
    )
    with pytest.raises(CommitConflictError):
        t.publish_branch("late")
    # main kept its row; nothing was lost
    assert {r["conv_id"] for r in t.read().collect()} == {"c1", "c2"}


def test_snapshot_ids_unique_across_refs(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.create_branch("b1")
    b = t.branch("b1")
    for i in range(2):
        t.merge_cdc(
            _batch(spark, [(i + 1, "insert", f"m{i}", 0, "user", "x", None, "2026-01-01")]),
            applied_range=(i * 10, i * 10 + 10),
        )
        b.merge_cdc(
            _batch(spark, [(100 + i, "insert", f"s{i}", 0, "user", "y", None, "2026-01-01")]),
            applied_range=(100 + i * 10, 110 + i * 10),
        )
    import os

    ids = [
        int(f[len("snap-"):-len(".json")])
        for f in os.listdir(str(tmp_path / "t" / "metadata"))
        if f.startswith("snap-")
    ]
    assert len(ids) == len(set(ids)) == 5  # create + 2 main + 2 branch


def test_expire_retains_branch_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.create_branch("stage")
    b = t.branch("stage")
    b.merge_cdc(
        _batch(spark, [(1, "insert", "s1", 0, "user", "staged", None, "2026-01-01")]),
        applied_range=(0, 10),
    )
    # main churns enough that keep_last=1 would drop everything old
    for i in range(3):
        t.merge_cdc(
            _batch(spark, [(10 + i, "insert", f"m{i}", 0, "user", "x", None, "2026-01-02")]),
            applied_range=(10 + i, 11 + i),
        )
    t.expire_snapshots(keep_last=1)
    # the staged branch is still fully readable
    assert b.read().count() == 1
    # ...though publish correctly conflicts (main advanced); restage path:
    with pytest.raises(CommitConflictError):
        t.publish_branch("stage")


def test_branch_name_validation_and_drop(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for bad in ("main", "", "a/b", "x" * 65):
        with pytest.raises(ValueError):
            t.create_branch(bad)
    t.create_branch("ok-1")
    with pytest.raises(ValueError):
        t.create_branch("ok-1")  # duplicate
    t.drop_branch("ok-1")
    assert "ok-1" not in t.list_branches()
    with pytest.raises(ValueError):
        t.branch("ok-1")


def test_publish_succeeds_after_expire_with_deep_branch(spark, tmp_path):
    """Review-confirmed: GC must retain a branch's ENTIRE ancestry
    chain (not a keep_last window) or publish_branch's ancestry walk
    breaks on the expired intermediate manifests."""
    t = _mk(spark, tmp_path / "t")
    t.create_branch("stage")
    b = t.branch("stage")
    for i in range(5):  # deeper than keep_last
        b.merge_cdc(
            _batch(spark, [(i + 1, "insert", f"s{i}", 0, "user", "x", None,
                            "2026-01-01")]),
            applied_range=(i * 10, i * 10 + 10),
        )
    t.expire_snapshots(keep_last=3)
    head = t.publish_branch("stage")
    assert t.manifest(refresh=True)["snapshot_id"] == head
    assert t.read().count() == 5
