"""Conversation-granularity incremental near-dup index: epoch sync ==
single-shot banding of the final states, update/delete retraction,
exactly-once replay, streaming-tail wiring."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.conversations import conversation_docs
from neosync_spark.operators.dedup_index import (
    conv_index_pairs,
    conv_index_sync,
    create_conv_index,
)
from neosync_spark.operators.similarity import minhash_dedup_pairs
from neosync_spark.schema import KEY_COLS, transcript_schema

BASE = "the quick brown fox jumps over the lazy dog again and again ok"


def _mk(spark, path):
    return SnapshotTable.create(
        spark, str(path), transcript_schema(),
        key_cols=KEY_COLS, order_cols=["ts"], n_buckets=8,
    )


def _batch(spark, rows):
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    for c in ("role", "text", "tool"):
        pdf[c] = pdf[c].astype("string")
    return spark.createDataFrame(pdf)


def _turns(conv, n, text=BASE, lsn0=0):
    return [
        (lsn0 + i, "insert", conv, i, "user", f"{text} turn {i}", None,
         "2024-01-01 00:00:01")
        for i in range(n)
    ]


def _expected_pairs(spark, t, threshold=0.7):
    docs = conversation_docs(t.read())
    return {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            docs, "doc", "conv_id", threshold=threshold
        ).collect()
    }


def _index_pairs(index, t, threshold=0.7):
    return {
        (r.id_a, r.id_b)
        for r in conv_index_pairs(index, t, threshold=threshold).collect()
    }


def test_epoch_sync_matches_single_shot(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    idx = create_conv_index(spark, str(tmp_path / "idx"), n_buckets=8)
    # epoch 1: two near-dup convs + one unrelated
    rows1 = (
        _turns("a", 4, lsn0=0)
        + _turns("b", 4, lsn0=10)
        + _turns("z", 4, text="completely different words entirely", lsn0=20)
    )
    i1 = t.merge_cdc(_batch(spark, rows1), applied_range=(0, 30))
    conv_index_sync(t, idx, i1.snapshot_id)
    # epoch 2: a third near-dup of the same family arrives (cross-epoch)
    i2 = t.merge_cdc(
        _batch(spark, _turns("c", 4, lsn0=30)), applied_range=(30, 40)
    )
    conv_index_sync(t, idx, i2.snapshot_id, from_snapshot=i1.snapshot_id)

    got = _index_pairs(idx, t)
    assert got == _expected_pairs(spark, t)
    assert ("a", "c") in got and ("b", "c") in got  # cross-epoch collisions


def test_update_resigns_and_delete_retracts(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    idx = create_conv_index(spark, str(tmp_path / "idx"), n_buckets=8)
    rows = _turns("a", 4, lsn0=0) + _turns("b", 4, lsn0=10)
    i1 = t.merge_cdc(_batch(spark, rows), applied_range=(0, 20))
    conv_index_sync(t, idx, i1.snapshot_id)
    assert ("a", "b") in _index_pairs(idx, t)

    # epoch 2: rewrite every turn of b to unrelated text -> pair gone
    upd = [
        (100 + i, "update", "b", i, "user",
         f"totally unrelated replacement content {i}", None,
         "2024-01-02 00:00:01")
        for i in range(4)
    ]
    i2 = t.merge_cdc(_batch(spark, upd), applied_range=(20, 40))
    conv_index_sync(t, idx, i2.snapshot_id, from_snapshot=i1.snapshot_id)
    got = _index_pairs(idx, t)
    assert ("a", "b") not in got
    assert got == _expected_pairs(spark, t)

    # epoch 3: delete conv a entirely -> all its band rows retract
    dels = [
        (200 + i, "delete", "a", i, None, None, None, "2024-01-03 00:00:01")
        for i in range(4)
    ]
    i3 = t.merge_cdc(_batch(spark, dels), applied_range=(40, 60))
    conv_index_sync(t, idx, i3.snapshot_id, from_snapshot=i2.snapshot_id)
    live = idx.read()
    assert live.filter(F.col("conv_id") == "a").count() == 0
    assert _index_pairs(idx, t) == _expected_pairs(spark, t)


def test_replay_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    idx = create_conv_index(spark, str(tmp_path / "idx"), n_buckets=8)
    i1 = t.merge_cdc(
        _batch(spark, _turns("a", 3) + _turns("b", 3, lsn0=10)),
        applied_range=(0, 20),
    )
    info = conv_index_sync(t, idx, i1.snapshot_id)
    before = idx.manifest(refresh=True)["snapshot_id"]
    again = conv_index_sync(t, idx, i1.snapshot_id)
    assert idx.manifest(refresh=True)["snapshot_id"] == before
    assert again.rows_written == 0
    assert info.applied_range == again.applied_range


def test_streaming_tail_maintains_conv_index(spark, tmp_path):
    from neosync_spark.engine import EngineConfig, ReplayEngine
    from neosync_spark.streaming.consumers import conv_dedup_index_consumer
    from neosync_spark.streaming.stream import StreamingReplay

    rows = (
        _turns("a", 4, lsn0=0)
        + _turns("b", 4, lsn0=10)
        + _turns("z", 4, text="completely different words entirely", lsn0=20)
        + _turns("c", 4, lsn0=30)
    )
    log_dir = str(tmp_path / "log")
    df = _batch(spark, rows)
    # two WAL files -> at least two epochs at max_files_per_trigger=1
    df.filter(F.col("lsn") < 20).coalesce(1).write.parquet(log_dir)
    df.filter(F.col("lsn") >= 20).coalesce(1).write.mode("append").parquet(
        log_dir
    )

    t = _mk(spark, tmp_path / "t")
    idx = create_conv_index(spark, str(tmp_path / "idx"), n_buckets=8)
    eng = ReplayEngine(spark, t, config=EngineConfig())
    q = StreamingReplay(
        eng, consumers=[conv_dedup_index_consumer(idx)]
    ).start(log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(120)

    assert _index_pairs(idx, t) == _expected_pairs(spark, t)
    assert len(idx.applied_ranges()) >= 2
