"""Right-to-be-forgotten purge: physical erasure from data files,
quarantine sidecars and snapshot history, with the exactly-once ledger
intact and branch-pinned history refused."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.sources.changelog import ChangeLogSource
from neosync_spark.synth import SynthConfig, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=6_000, n_convs=200)


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("log") / "changelog")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(p)
    return p


def _build(spark, path, log_path, mode="mor"):
    t = SnapshotTable.create(
        spark, str(path), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    eng = ReplayEngine(
        spark, t, config=EngineConfig(batch_lsn_size=2_000, merge_mode=mode)
    )
    eng.replay(ChangeLogSource(spark, log_path))
    return t


def _raw_live_rows(spark, t, conv_ids):
    """Scan EVERY parquet file referenced by ANY manifest on disk for
    the subjects — erasure means zero rows anywhere, not just in the
    current snapshot's view."""
    files = sorted(
        glob.glob(os.path.join(t.path, "data", "*", "*", "*.parquet"))
    )
    if not files:
        return 0
    return (
        spark.read.parquet(*files)
        .filter(F.col("conv_id").isin(conv_ids))
        .count()
    )


def test_purge_erases_everywhere_ledger_intact(spark, tmp_path, log_path):
    t = _build(spark, tmp_path / "t", log_path, mode="mor")
    state = t.read()
    subjects = [
        r["conv_id"]
        for r in state.select("conv_id").distinct().orderBy("conv_id").limit(2).collect()
    ]
    expected = state.filter(~F.col("conv_id").isin(subjects)).toPandas()
    assert _raw_live_rows(spark, t, subjects) > 0
    ranges_before = t.applied_ranges()

    # plant quarantine sidecars: one subject row + one innocent row
    qdir = os.path.join(t.path, "metadata", "quarantine", "range=0_1")
    spark.createDataFrame(
        [(subjects[0], 0, "bad"), ("someone-else", 0, "fine")],
        "conv_id string, turn_idx int, text string",
    ).write.parquet(qdir)

    out = t.purge_keys(subjects)
    assert out["purged_rows"] > 0
    assert out["buckets_rewritten"] >= 1
    assert out["quarantine_rows_scrubbed"] == 1
    assert out["refs_remaining"] == []

    # table view: exactly the non-subject state (incl. folded deltas)
    assert_pdf_equal(t.read().toPandas(), expected, ["conv_id", "turn_idx"])
    # physical erasure: no file on disk holds the subjects
    assert _raw_live_rows(spark, t, subjects) == 0
    # sidecar: innocent row survives, subject row gone
    q = spark.read.parquet(qdir)
    assert [r["conv_id"] for r in q.collect()] == ["someone-else"]

    # exactly-once ledger untouched: a crash-recovery replay is a no-op
    assert t.applied_ranges() == ranges_before
    eng = ReplayEngine(spark, t, config=EngineConfig(batch_lsn_size=2_000))
    stats = eng.replay(ChangeLogSource(spark, log_path))
    assert stats.batches_applied == 0
    assert stats.batches_skipped == len(ranges_before)
    assert _raw_live_rows(spark, t, subjects) == 0


def test_purge_refuses_branch_pinned_history(spark, tmp_path, log_path):
    t = _build(spark, tmp_path / "t", log_path, mode="cow")
    subject = t.read().select("conv_id").orderBy("conv_id").first()["conv_id"]
    t.create_branch("staging")
    with pytest.raises(ValueError, match="staging"):
        t.purge_keys([subject])
    # force: purges main, reports what still pins history
    out = t.purge_keys([subject], force=True)
    assert out["refs_remaining"] == ["staging"]
    assert t.read().filter(F.col("conv_id") == subject).count() == 0


def test_purge_no_expire_leaves_history_then_gc_completes(
    spark, tmp_path, log_path
):
    t = _build(spark, tmp_path / "t", log_path, mode="cow")
    subject = t.read().select("conv_id").orderBy("conv_id").first()["conv_id"]
    out = t.purge_keys([subject], expire=False)
    assert out["expired"] == {}
    # prior snapshot files still hold the data until GC runs
    assert _raw_live_rows(spark, t, [subject]) > 0
    t.expire_snapshots(keep_last=1)
    assert _raw_live_rows(spark, t, [subject]) == 0


def test_purge_cli(spark, tmp_path, log_path):
    from neosync_spark import cli

    t = _build(spark, tmp_path / "t", log_path, mode="cow")
    subject = t.read().select("conv_id").orderBy("conv_id").first()["conv_id"]
    rc = cli.main([
        "--master", "local[4]",
        "purge", "--table", str(tmp_path / "t"), "--key", subject,
    ])
    assert rc == 0
    t.manifest(refresh=True)  # the CLI purged via its own handle
    assert t.read().filter(F.col("conv_id") == subject).count() == 0
    assert _raw_live_rows(spark, t, [subject]) == 0

    # unknown keys: no-op result, not a crash
    out = t.purge_keys(["no-such-conversation"])
    assert out["purged_rows"] == 0
    with pytest.raises(ValueError):
        t.purge_keys([])
