"""Replication lag / freshness (operators/monitor.replication_lag).

The applied side must never be scanned: W comes from the ledger,
applied freshness from manifest zone maps; only the pending log tail
is read (lsn >= W pushed into the parquet scan).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.monitor import replication_lag
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.synth import SynthConfig, generate_pandas

CFG = SynthConfig(n_events=6_000, n_convs=250)


def _half_replayed(spark, tmp_path, log_dir):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    mid = CFG.n_events // 2
    eng = ReplayEngine(
        spark, t, config=EngineConfig(batch_lsn_size=mid, lineage=False),
    )
    log = spark.read.parquet(log_dir)
    eng.replay(
        lambda lo, hi: log.filter(
            (F.col("lsn") >= lo) & (F.col("lsn") < hi)
        ),
        lsn_lo=0,
        lsn_hi=mid - 1,  # inclusive bound: one [0, mid) batch
    )
    return t, mid


def test_lag_half_applied(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    pdf = generate_pandas(CFG)
    spark.createDataFrame(pdf).write.parquet(log_dir)
    t, mid = _half_replayed(spark, tmp_path, log_dir)
    log = spark.read.parquet(log_dir)

    row = replication_lag(log, t).collect()[0]
    pend = pdf[pdf["lsn"] >= mid]
    assert row["applied_lsn_hi"] == mid
    assert row["events_behind"] == len(pend)
    assert row["convs_behind"] == pend["conv_id"].nunique()
    assert row["log_lsn_hi"] == int(pdf["lsn"].max())

    applied_hi = pdf[pdf["lsn"] < mid]["ts"].max().to_pydatetime()
    newest = pend["ts"].max().to_pydatetime()
    exp_lag = int(
        (
            (newest - datetime.datetime(1970, 1, 1)).total_seconds()
            - (applied_hi - datetime.datetime(1970, 1, 1)).total_seconds()
        )
        // 1
    )
    # floor of the micros diff, computed the same way
    exp_lag = int(
        (
            int((newest - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6)
            - int(
                (applied_hi - datetime.datetime(1970, 1, 1)).total_seconds()
                * 1e6
            )
        )
        // 1_000_000
    )
    assert row["lag_seconds"] == exp_lag


def test_lag_caught_up_and_fresh(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(log_dir)
    log = spark.read.parquet(log_dir)

    # fully caught up
    t = SnapshotTable.create(
        spark, str(tmp_path / "t_full"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    eng = ReplayEngine(
        spark, t,
        config=EngineConfig(batch_lsn_size=CFG.n_events, lineage=False),
    )
    eng.replay(
        lambda lo, hi: log.filter(
            (F.col("lsn") >= lo) & (F.col("lsn") < hi)
        ),
        lsn_lo=0,
        lsn_hi=CFG.n_events - 1,
    )
    row = replication_lag(log.filter(F.col("lsn") < CFG.n_events), t).collect()[0]
    assert row["events_behind"] == 0
    assert row["lag_seconds"] == 0
    assert row["log_lsn_hi"] is None  # no pending tail

    # fresh table: everything pending, lag undefined
    t0 = SnapshotTable.create(
        spark, str(tmp_path / "t0"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=8,
    )
    row0 = replication_lag(log, t0).collect()[0]
    assert row0["applied_lsn_hi"] == 0
    assert row0["events_behind"] == log.count()
    assert row0["lag_seconds"] is None


def test_lag_scan_is_pruned_and_table_free(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(log_dir)
    t, mid = _half_replayed(spark, tmp_path, log_dir)
    log = spark.read.parquet(log_dir)

    plan = (
        replication_lag(log, t)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert f"GreaterThanOrEqual(lsn,{mid})" in plan  # pushed to the scan
    assert plan.count("Scan parquet") == 1  # the applied side is never read
