"""Cross-table consistent reads at a common LSN watermark
(plans/consistent.py) + lsn time travel (SnapshotTable.snapshot_at_lsn).

The reference's datasync workflow fans one source out to several
destinations committed independently
(/root/reference/worker/pkg/workflows/datasync/workflow/workflow.go:82);
consistency across them is the ledger-alignment analog.
"""

from __future__ import annotations

import pytest

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.plans.consistent import consistent_watermark, read_consistent
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.sources.changelog import ChangeLogSource
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=8_000, n_convs=300)


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("log") / "changelog")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(p)
    return p


def _mk(spark, path, batch, lsn_hi, log_path):
    t = SnapshotTable.create(
        spark, str(path), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    eng = ReplayEngine(spark, t, config=EngineConfig(batch_lsn_size=batch))
    eng.replay(ChangeLogSource(spark, log_path), lsn_lo=0, lsn_hi=lsn_hi)
    return t


def test_checkpoint_boundaries_are_range_highs(spark, tmp_path, log_path):
    t = _mk(spark, tmp_path / "a", 2_000, CFG.n_events - 1, log_path)
    assert t.checkpoint_boundaries() == [2_000, 4_000, 6_000, 8_000]


def test_snapshot_at_lsn_time_travel(spark, tmp_path, log_path):
    t = _mk(spark, tmp_path / "a", 2_000, CFG.n_events - 1, log_path)
    sid = t.snapshot_at_lsn(4_000)
    got = t.read(snapshot_id=sid).toPandas()
    pdf = generate_pandas(CFG)
    exp = expected_final_state(pdf[pdf["lsn"] < 4_000])
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])


def test_snapshot_at_lsn_strict_rejects_non_boundary(spark, tmp_path, log_path):
    t = _mk(spark, tmp_path / "a", 2_000, CFG.n_events - 1, log_path)
    with pytest.raises(ValueError, match="not a checkpoint boundary"):
        t.snapshot_at_lsn(3_000)
    # non-strict: newest state at-or-before (the 2k-boundary snapshot)
    assert t.snapshot_at_lsn(3_000, strict=False) == t.snapshot_at_lsn(2_000)


def test_consistent_watermark_and_read(spark, tmp_path, log_path):
    # same feed, two destinations on different commit grids:
    # a: 2k grid over the full log   -> {2k, 4k, 6k, 8k}
    # b: 3k grid, tail not applied   -> {3k, 6k}
    a = _mk(spark, tmp_path / "a", 2_000, CFG.n_events - 1, log_path)
    b = _mk(spark, tmp_path / "b", 3_000, 5_999, log_path)
    assert b.checkpoint_boundaries() == [3_000, 6_000]
    w = consistent_watermark([a, b])
    assert w == 6_000

    views = read_consistent({"a": a, "b": b})
    pdf = generate_pandas(CFG)
    exp = expected_final_state(pdf[pdf["lsn"] < 6_000])
    for name in ("a", "b"):
        assert_pdf_equal(views[name].toPandas(), exp, ["conv_id", "turn_idx"], name)


def test_consistent_watermark_no_common_grid_raises(spark, tmp_path, log_path):
    a = _mk(spark, tmp_path / "a", 2_000, 3_999, log_path)  # {2k, 4k}
    b = _mk(spark, tmp_path / "b", 3_000, 2_999, log_path)  # {3k}
    with pytest.raises(ValueError, match="no checkpoint boundary"):
        consistent_watermark([a, b])


def test_explicit_lsn_must_be_shared_boundary(spark, tmp_path, log_path):
    a = _mk(spark, tmp_path / "a", 2_000, CFG.n_events - 1, log_path)
    b = _mk(spark, tmp_path / "b", 3_000, 5_999, log_path)
    with pytest.raises(ValueError, match="not a checkpoint boundary"):
        read_consistent({"a": a, "b": b}, lsn=4_000)  # a-only boundary
