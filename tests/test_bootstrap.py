"""Bootstrap-snapshot → tail handoff (plans/bootstrap.py).

The invariant: snapshot at S + tail from resume_lsn <= S converges to
the same final state as replaying the full log — overlap re-delivery
is idempotent, deletes re-delivered for snapshot-absent keys are
no-ops, and post-snapshot events win exactly when they won at source.
"""

from __future__ import annotations

import pandas as pd
import pytest

from neosync_spark.engine import EngineConfig
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.plans.bootstrap import bootstrap_then_tail
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=8_000, n_convs=250)


def _snapshot_at(log: pd.DataFrame, s: int) -> pd.DataFrame:
    """Consistent source state at log position s, each row stamped with
    the (ts, lsn) of the winning change it reflects."""
    pre = log[log["lsn"] <= s].sort_values(["ts", "lsn"], kind="mergesort")
    last = pre.groupby(["conv_id", "turn_idx"], as_index=False).tail(1)
    alive = last[last["op"] != "delete"].copy()
    alive["op"] = "insert"
    return alive[
        ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]
    ].reset_index(drop=True)


@pytest.mark.parametrize("overlap_frac", [0.0, 0.15])
def test_handoff_converges_to_full_log_state(spark, tmp_path, overlap_frac):
    log = generate_pandas(CFG)
    hi = int(log["lsn"].max())
    s = (hi * 3) // 5
    resume = s - int(hi * overlap_frac)  # conservative resume marker

    snap = spark.createDataFrame(_snapshot_at(log, s))
    full = spark.createDataFrame(log)

    table = SnapshotTable.create(
        spark, str(tmp_path / f"t{overlap_frac}"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )

    def slicer(lo, hi_):
        return full.filter(f"lsn >= {lo} AND lsn < {hi_}")

    stats = bootstrap_then_tail(
        spark, table, snap, slicer, resume_lsn=resume, lsn_hi=hi,
        config=EngineConfig(batch_lsn_size=2000, lineage=False),
    )
    assert stats.bootstrap.rows_written > 0
    assert stats.tail.batches_applied >= 1
    assert_pdf_equal(
        table.read().toPandas(), expected_final_state(log), ["conv_id", "turn_idx"]
    )


def test_bootstrap_rerun_is_exactly_once(spark, tmp_path):
    log = generate_pandas(SynthConfig(n_events=2_000, n_convs=80))
    hi = int(log["lsn"].max())
    s = hi // 2
    snap = spark.createDataFrame(_snapshot_at(log, s))
    full = spark.createDataFrame(log)
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=4,
    )

    def slicer(lo, hi_):
        return full.filter(f"lsn >= {lo} AND lsn < {hi_}")

    cfg = EngineConfig(batch_lsn_size=1500, lineage=False)
    bootstrap_then_tail(spark, table, snap, slicer, s, hi, config=cfg)
    before = table.read().count()
    # a crashed-and-restarted pipeline re-runs the whole plan: the
    # ledger makes both halves no-ops
    again = bootstrap_then_tail(spark, table, snap, slicer, s, hi, config=cfg)
    assert again.tail.batches_applied == 0
    assert again.tail.batches_skipped >= 1
    assert table.read().count() == before
    assert_pdf_equal(
        table.read().toPandas(), expected_final_state(log), ["conv_id", "turn_idx"]
    )
