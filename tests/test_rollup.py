"""Incremental materialized-view maintenance: incremental == full
recompute under updates, deletes, vanished groups, and replays."""

from __future__ import annotations

import pandas as pd

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.rollup import (
    ROLLUP_SCHEMA,
    conversation_rollup,
    incremental_rollup_sync,
)
from neosync_spark.schema import KEY_COLS, transcript_schema


def _mk_src(spark, path):
    return SnapshotTable.create(
        spark, str(path), transcript_schema(), key_cols=KEY_COLS,
        order_cols=["ts"], n_buckets=4,
    )


def _mk_dst(spark, path):
    return SnapshotTable.create(
        spark, str(path), ROLLUP_SCHEMA, key_cols=["conv_id"],
        order_cols=["ts"], n_buckets=4,
    )


def _batch(spark, rows):
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf)


def _rollup_state(dst):
    return {
        r["conv_id"]: (r["n_turns"], r["n_user_turns"], r["total_chars"])
        for r in dst.read().collect()
    }


def _expected(src):
    return {
        r["conv_id"]: (r["n_turns"], r["n_user_turns"], r["total_chars"])
        for r in conversation_rollup(src.read()).collect()
    }


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    src = _mk_src(spark, tmp_path / "src")
    dst = _mk_dst(spark, tmp_path / "dst")

    src.merge_cdc(_batch(spark, [
        (1, "insert", "c1", 0, "user", "hello", None, "2024-01-01 00:00:01"),
        (2, "insert", "c1", 1, "assistant", "hi", None, "2024-01-01 00:00:02"),
        (3, "insert", "c2", 0, "user", "yo", None, "2024-01-01 00:00:03"),
        (4, "insert", "c3", 0, "user", "solo", None, "2024-01-01 00:00:04"),
    ]), applied_range=(0, 10))
    s1 = src.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(src, dst, None, s1)
    assert _rollup_state(dst) == _expected(src)

    # second wave: update c1, delete c2's only turn (group vanishes),
    # new conversation c4; c3 untouched
    src.merge_cdc(_batch(spark, [
        (11, "update", "c1", 1, "user", "hi there", None, "2024-01-01 00:00:11"),
        (12, "delete", "c2", 0, None, None, None, "2024-01-01 00:00:12"),
        (13, "insert", "c4", 0, "user", "newcomer", None, "2024-01-01 00:00:13"),
    ]), applied_range=(10, 20))
    s2 = src.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(src, dst, s1, s2)

    exp = _expected(src)
    assert _rollup_state(dst) == exp
    assert "c2" not in exp  # vanished group really deleted
    assert exp["c1"] == (2, 2, 13)  # role flipped to user, text lengthened

    # replaying the same sync is a no-op (exactly-once ledger)
    info = incremental_rollup_sync(src, dst, s1, s2)
    assert info.rows_written == 0
    assert _rollup_state(dst) == exp


def test_rollup_delete_of_newest_turn_still_advances(spark, tmp_path):
    """Deleting the newest turn LOWERS the group's max alive ts; the
    high-watermark ts must still let the upsert win LWW in dst."""
    src = _mk_src(spark, tmp_path / "src")
    dst = _mk_dst(spark, tmp_path / "dst")
    src.merge_cdc(_batch(spark, [
        (1, "insert", "c1", 0, "user", "old", None, "2024-01-01 00:00:01"),
        (2, "insert", "c1", 1, "user", "newest", None, "2024-01-01 00:09:00"),
    ]), applied_range=(0, 10))
    s1 = src.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(src, dst, None, s1)
    assert _rollup_state(dst)["c1"] == (2, 2, 9)

    src.merge_cdc(_batch(spark, [
        (11, "delete", "c1", 1, None, None, None, "2024-01-01 00:09:30"),
    ]), applied_range=(10, 20))
    s2 = src.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(src, dst, s1, s2)
    assert _rollup_state(dst)["c1"] == (1, 1, 3)
    assert _rollup_state(dst) == _expected(src)


def test_rollup_two_hop_backward_watermark(spark, tmp_path):
    """Regression (code review): chained incremental syncs where the
    second hop's change activity carries OLDER event timestamps than
    the first (delete the newest turn, then the older one). With an
    event-derived watermark the second sync's delete would lose LWW in
    dst and the vanished conversation would survive forever; the sync
    ordinal makes each later sync win by construction."""
    src = _mk_src(spark, tmp_path / "src")
    dst = _mk_dst(spark, tmp_path / "dst")
    src.merge_cdc(_batch(spark, [
        (1, "insert", "c1", 0, "user", "old turn", None, "2024-01-01 00:00:01"),
        (2, "insert", "c1", 1, "user", "newest", None, "2024-01-01 00:09:00"),
        (3, "insert", "c2", 0, "user", "bystander", None, "2024-01-01 00:00:03"),
    ]), applied_range=(0, 10))
    s1 = src.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(src, dst, None, s1)

    # hop 1: delete the NEWEST turn (diff activity ts = 00:09)
    src.merge_cdc(_batch(spark, [
        (11, "delete", "c1", 1, None, None, None, "2024-01-01 00:09:30"),
    ]), applied_range=(10, 20))
    s2 = src.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(src, dst, s1, s2)
    assert _rollup_state(dst)["c1"] == (1, 1, 8)

    # hop 2: delete the OLDER turn (diff pre-image ts = 00:00:01 —
    # strictly older than hop 1's activity) -> the group vanishes
    src.merge_cdc(_batch(spark, [
        (21, "delete", "c1", 0, None, None, None, "2024-01-01 00:09:45"),
    ]), applied_range=(20, 30))
    s3 = src.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(src, dst, s2, s3)

    state = _rollup_state(dst)
    assert "c1" not in state, "vanished group must not survive a later sync"
    assert state == _expected(src)
