"""Incremental ANALYZE: per-bucket stats kept in sync from manifest
bucket diffs — incremental == full profile, touched-bucket pruning,
empty-bucket retraction, additive-distinct gating, replay no-op."""

from __future__ import annotations

import pandas as pd

from neosync_spark.lakehouse import SnapshotTable, bucket_expr
from neosync_spark.operators.profile import profile_columns
from neosync_spark.operators.stats_sync import (
    changed_buckets,
    create_stats_table,
    merged_stats,
    stats_sync,
)
from neosync_spark.schema import KEY_COLS, transcript_schema

COLS = ["conv_id", "turn_idx", "role", "text", "tool"]
N_BUCKETS = 8


def _mk_src(spark, path):
    return SnapshotTable.create(
        spark, str(path), transcript_schema(), key_cols=KEY_COLS,
        order_cols=["ts"], n_buckets=N_BUCKETS,
    )


def _batch(spark, rows):
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf)


def _merged(stats):
    return {
        r["column"]: r.asDict()
        for r in merged_stats(stats, additive_cols=["conv_id"]).collect()
    }


def _full_profile(src):
    return {
        r["column"]: r.asDict()
        for r in profile_columns(src.read(), COLS).collect()
    }


def _assert_matches_full(stats, src):
    got, want = _merged(stats), _full_profile(src)
    assert set(got) == set(want)
    for c in COLS:
        g, w = got[c], want[c]
        assert (g["n_rows"], g["n_nulls"]) == (w["n_rows"], w["n_nulls"]), c
        assert g["null_frac"] == w["null_frac"], c
        if c == "conv_id":
            assert g["n_distinct"] == w["n_distinct"]
        else:
            assert g["n_distinct"] is None, c
        lo = g["min_num"] if g["min_num"] is not None else g["min_str"]
        hi = g["max_num"] if g["max_num"] is not None else g["max_str"]
        if c == "turn_idx":
            assert (str(int(lo)), str(int(hi))) == (
                w["min_repr"], w["max_repr"],
            )
        else:
            assert (lo, hi) == (w["min_repr"], w["max_repr"]), c


def _rows(n, conv_base=0, text="hello", lsn0=0):
    out = []
    for i in range(n):
        out.append(
            (
                lsn0 + i,
                "insert",
                f"conv-{conv_base + i % 7}",
                i // 7,
                "user" if i % 2 == 0 else "assistant",
                None if i % 5 == 4 else f"{text} {i}",
                None if i % 3 else "search",
                f"2024-01-01 00:{i % 60:02d}:00",
            )
        )
    return out


def test_incremental_matches_full_profile(spark, tmp_path):
    src = _mk_src(spark, tmp_path / "src")
    stats = create_stats_table(spark, str(tmp_path / "stats"))

    src.merge_cdc(_batch(spark, _rows(40)), applied_range=(0, 40))
    s1 = src.manifest(refresh=True)["snapshot_id"]
    stats_sync(src, stats, COLS, s1)
    _assert_matches_full(stats, src)

    # epoch 2: updates, deletes, and brand-new conversations
    rows2 = _rows(15, conv_base=20, text="later", lsn0=100)
    rows2 += [
        (200, "update", "conv-0", 0, "assistant", "rewritten", None,
         "2024-01-02 00:00:00"),
        (201, "delete", "conv-1", 0, None, None, None,
         "2024-01-02 00:00:01"),
    ]
    src.merge_cdc(_batch(spark, rows2), applied_range=(100, 202))
    s2 = src.manifest(refresh=True)["snapshot_id"]
    stats_sync(src, stats, COLS, s2, from_snapshot=s1)
    _assert_matches_full(stats, src)


def test_sync_prunes_to_changed_buckets(spark, tmp_path):
    src = _mk_src(spark, tmp_path / "src")
    stats = create_stats_table(spark, str(tmp_path / "stats"))
    src.merge_cdc(_batch(spark, _rows(40)), applied_range=(0, 40))
    s1 = src.manifest(refresh=True)["snapshot_id"]
    stats_sync(src, stats, COLS, s1)

    # touch exactly one conversation → at most 1 changed bucket
    src.merge_cdc(
        _batch(
            spark,
            [(300, "update", "conv-2", 0, "user", "touched", None,
              "2024-01-03 00:00:00")],
        ),
        applied_range=(300, 301),
    )
    s2 = src.manifest(refresh=True)["snapshot_id"]
    touched = changed_buckets(src, s1, s2)
    [want] = (
        spark.createDataFrame([("conv-2",)], "conv_id string")
        .select(bucket_expr("conv_id", N_BUCKETS))
        .collect()
    )
    assert touched == [int(want[0])]

    # only the touched bucket's stats rows move at the new ordinal
    stats_sync(src, stats, COLS, s2, from_snapshot=s1)
    moved = (
        stats.read()
        .filter(f"cast(ts as long) = {s2}")
        .select("bucket_id")
        .distinct()
        .collect()
    )
    assert [int(r[0]) for r in moved] == touched
    _assert_matches_full(stats, src)


def test_emptied_bucket_retracts_stats(spark, tmp_path):
    src = _mk_src(spark, tmp_path / "src")
    stats = create_stats_table(spark, str(tmp_path / "stats"))
    convs = [f"conv-{i}" for i in range(6)]
    rows = [
        (i, "insert", c, 0, "user", f"t {c}", None, "2024-01-01 00:00:00")
        for i, c in enumerate(convs)
    ]
    src.merge_cdc(_batch(spark, rows), applied_range=(0, 6))
    s1 = src.manifest(refresh=True)["snapshot_id"]
    stats_sync(src, stats, COLS, s1)

    # find a conversation alone in its bucket, then delete it
    by_bucket = {}
    for r in (
        spark.createDataFrame([(c,) for c in convs], "conv_id string")
        .withColumn("b", bucket_expr("conv_id", N_BUCKETS))
        .collect()
    ):
        by_bucket.setdefault(int(r["b"]), []).append(r["conv_id"])
    lone = [(b, cs[0]) for b, cs in by_bucket.items() if len(cs) == 1]
    assert lone, "fixture must place one conversation alone in a bucket"
    b, victim = lone[0]

    src.merge_cdc(
        _batch(
            spark,
            [(10, "delete", victim, 0, None, None, None,
              "2024-01-02 00:00:00")],
        ),
        applied_range=(10, 11),
    )
    s2 = src.manifest(refresh=True)["snapshot_id"]
    stats_sync(src, stats, COLS, s2, from_snapshot=s1)
    assert stats.read().filter(f"bucket_id = {b}").count() == 0
    _assert_matches_full(stats, src)


def test_streaming_tail_maintains_stats(spark, tmp_path):
    """stats_consumer wired into StreamingReplay: after the tail
    drains, the merged profile equals a full recompute over the final
    state, and the stats table advanced through multiple epochs via
    its own ledger."""
    from neosync_spark.engine import EngineConfig, ReplayEngine
    from neosync_spark.streaming.consumers import stats_consumer
    from neosync_spark.streaming.stream import StreamingReplay
    from neosync_spark.synth import SynthConfig, generate_pandas

    log = generate_pandas(SynthConfig(n_events=3000, n_convs=60))
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(log).repartition(6).write.parquet(log_dir)

    src = _mk_src(spark, tmp_path / "t")
    stats = create_stats_table(spark, str(tmp_path / "stats"))
    eng = ReplayEngine(spark, src, config=EngineConfig())
    q = StreamingReplay(
        eng, consumers=[stats_consumer(stats, COLS)]
    ).start(log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    q.awaitTermination(120)

    _assert_matches_full(stats, src)
    assert len(stats.applied_ranges()) >= 2


def test_replay_is_noop_and_approx_mode_runs(spark, tmp_path):
    src = _mk_src(spark, tmp_path / "src")
    stats = create_stats_table(spark, str(tmp_path / "stats"))
    src.merge_cdc(_batch(spark, _rows(30)), applied_range=(0, 30))
    s1 = src.manifest(refresh=True)["snapshot_id"]
    first = stats_sync(src, stats, COLS, s1)
    again = stats_sync(src, stats, COLS, s1)
    assert again.rows_written == 0
    assert again.snapshot_id == first.snapshot_id
    _assert_matches_full(stats, src)

    # approx mode: same counts/min/max, HLL distinct within 2% here
    stats2 = create_stats_table(spark, str(tmp_path / "stats2"))
    stats_sync(src, stats2, COLS, s1, approx=True)
    got = _merged(stats2)
    want = _full_profile(src)
    assert got["text"]["n_rows"] == want["text"]["n_rows"]
    nd, exact = got["conv_id"]["n_distinct"], want["conv_id"]["n_distinct"]
    assert abs(nd - exact) <= max(1, int(0.1 * exact))
