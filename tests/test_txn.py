"""Source-transaction-atomic apply (operators/txn.py + EngineConfig.txn_cols).

The invariant under test: no published table state ever contains half a
source transaction — batch ends snap to txn boundaries, a torn txn at
the log tail is held back, and a later replay applies it once its
remaining events arrive. The reference syncs whole tables and never
faces this; the txn columns model the public Debezium transaction
metadata (transaction.id / event_count).
"""

from __future__ import annotations

import pandas as pd
import pytest

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.txn import txn_complete_split, txn_safe_boundary
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=10_000, n_convs=300)
TXN = 8  # events per source transaction (txn k owns lsns [8k, 8k+8))


def _txn_log(cfg: SynthConfig = CFG) -> pd.DataFrame:
    log = generate_pandas(cfg)
    log["txn_id"] = log["lsn"] // TXN
    log["txn_total"] = log.groupby("txn_id")["lsn"].transform("count")
    return log


def test_complete_split_interleaved(spark):
    # two interleaved transactions + one complete one; txn 1 is torn
    pdf = pd.DataFrame(
        {
            "lsn": [0, 1, 2, 3, 4, 10, 11],
            "txn_id": [0, 1, 0, 1, 0, 2, 2],
            "txn_total": [3, 3, 3, 3, 3, 2, 2],
            "v": list("abcdefg"),
        }
    )
    df = spark.createDataFrame(pdf)
    ok, held = txn_complete_split(df)
    assert sorted(r["lsn"] for r in ok.collect()) == [0, 2, 4, 10, 11]
    assert sorted(r["lsn"] for r in held.collect()) == [1, 3]
    # shuffle-join fallback agrees
    ok2, held2 = txn_complete_split(df, broadcast_torn=False)
    assert sorted(r["lsn"] for r in ok2.collect()) == [0, 2, 4, 10, 11]
    assert sorted(r["lsn"] for r in held2.collect()) == [1, 3]


def test_safe_boundary(spark):
    log = _txn_log()
    full = spark.createDataFrame(log)
    # a slice cutting txn 87 mid-flight: safe == that txn's first lsn
    cut = 87 * TXN + 3
    assert txn_safe_boundary(full.filter(f"lsn < {cut}")) == 87 * TXN
    # a slice ending exactly on a boundary is all-complete
    assert txn_safe_boundary(full.filter(f"lsn < {87 * TXN}")) is None


def test_replay_snaps_to_txn_boundaries_and_heals(spark, tmp_path):
    log = _txn_log()
    max_lsn = int(log["lsn"].max())
    assert (max_lsn + 1) % TXN == 0  # full log ends on a boundary
    cut = max_lsn - 2  # visible log ends mid-transaction
    visible = spark.createDataFrame(log[log["lsn"] <= cut])
    torn_txn_start = (cut // TXN) * TXN

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    eng = ReplayEngine(
        spark, table,
        config=EngineConfig(
            batch_lsn_size=700,  # 700 % 8 != 0: every window cuts mid-txn
            lineage=False,
            txn_cols=("txn_id", "txn_total"),
        ),
    )

    def slicer(lo, hi):
        return visible.filter(f"lsn >= {lo} AND lsn < {hi}")

    stats = eng.replay(slicer, lsn_lo=0, lsn_hi=cut)
    # the tail transaction is torn: held, not applied
    assert stats.lsn_held_from == torn_txn_start
    # every commit range ends exactly on a transaction boundary
    assert all(hi % TXN == 0 for (_, hi) in (c.applied_range for c in stats.commits))
    got = table.read().toPandas()
    exp = expected_final_state(log[log["txn_id"] < cut // TXN])
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])

    # the log grows past the commit: a resumed replay applies ONLY the
    # held transaction and converges to the full-log state
    grown = spark.createDataFrame(log)

    def slicer2(lo, hi):
        return grown.filter(f"lsn >= {lo} AND lsn < {hi}")

    stats2 = eng.replay(slicer2, lsn_lo=0, lsn_hi=max_lsn)
    assert stats2.lsn_held_from is None
    assert stats2.batches_skipped >= 1  # ledger fast-forward, no re-probe
    assert stats2.rows_applied <= TXN
    assert_pdf_equal(
        table.read().toPandas(), expected_final_state(log), ["conv_id", "turn_idx"]
    )


def test_replay_txn_atomic_rejects_pipelining(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=4,
    )
    eng = ReplayEngine(
        spark, table,
        config=EngineConfig(merge_mode="mor", txn_cols=("txn_id", "txn_total")),
    )
    with pytest.raises(ValueError, match="txn-atomic"):
        eng.replay(lambda lo, hi: None, lsn_lo=0, lsn_hi=10, pipeline_batches=2)
