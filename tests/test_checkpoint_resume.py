"""Resume + exactly-once fixtures (FIXTURES.md §5).

Reference analogs: continuation token resume
(/root/reference/internal/continuation-token/continuation-token.go:27-52)
and retry ⇒ ON CONFLICT DO NOTHING idempotence
(/root/reference/worker/pkg/benthos/sql/output_sql_insert.go:189-191).
"""

from __future__ import annotations

import pytest

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.sources.changelog import ChangeLogSource
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=8_000, n_convs=300)
BATCH = 2_000


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("log") / "changelog")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(p)
    return p


def test_crash_restart_resumes_exactly_once(spark, tmp_path, log_path):
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, transcript_schema(), key_cols=KEY_COLS, n_buckets=8)
    eng = ReplayEngine(spark, t, config=EngineConfig(batch_lsn_size=BATCH))
    src = ChangeLogSource(spark, log_path)

    # "crash" after 2 of 4 batches
    s1 = eng.replay(src, stop_after_batches=2)
    assert s1.batches_applied == 2

    # restart: fresh engine + table handle (manifest re-read from disk)
    t2 = SnapshotTable.load(spark, path)
    eng2 = ReplayEngine(spark, t2, config=EngineConfig(batch_lsn_size=BATCH))
    s2 = eng2.replay(src)
    assert s2.batches_skipped == 2
    assert s1.batches_applied + s2.batches_applied == 4

    got = t2.read().toPandas()
    exp = expected_final_state(generate_pandas(CFG))
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])


def test_reapply_committed_range_is_noop(spark, tmp_path, log_path):
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, transcript_schema(), key_cols=KEY_COLS, n_buckets=8)
    eng = ReplayEngine(spark, t, config=EngineConfig(batch_lsn_size=BATCH))
    src = ChangeLogSource(spark, log_path)
    eng.replay(src)
    sid = t.manifest(refresh=True)["snapshot_id"]
    n_ranges = len(t.applied_ranges())

    s = eng.replay(src)  # full re-submission
    assert s.batches_applied == 0
    assert s.batches_skipped == n_ranges
    assert t.manifest(refresh=True)["snapshot_id"] == sid  # no new snapshot
    assert len(t.applied_ranges()) == n_ranges  # ledger unchanged


def test_ledger_maps_ranges_to_snapshots(spark, tmp_path, log_path):
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, transcript_schema(), key_cols=KEY_COLS, n_buckets=8)
    eng = ReplayEngine(spark, t, config=EngineConfig(batch_lsn_size=BATCH))
    eng.replay(ChangeLogSource(spark, log_path))
    ranges = t.applied_ranges()
    # contiguous, non-overlapping, one snapshot per range, rows recorded
    assert [(r[0], r[1]) for r in ranges] == [
        (i * BATCH, (i + 1) * BATCH) for i in range(len(ranges))
    ]
    sids = [r[2] for r in ranges]
    assert sids == sorted(sids) and len(set(sids)) == len(sids)
    assert sum(r[3] for r in ranges) > 0
    # lineage has rows for every committed snapshot
    lin = t.lineage().toPandas()
    assert set(sids) <= set(lin["snapshot_id"].tolist())
