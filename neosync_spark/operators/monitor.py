"""Pipeline health monitoring over the change log — the operational
layer a CDC ingest tier runs alongside the data path: rate anomaly
detection per operation type, so a stuck upstream (insert rate cliff),
a migration gone wrong (delete storm) or a replay loop (update spike)
pages before the table diverges.

Scale shape: ONE hash-agg over the log down to (op × time-bucket)
rows — map-side combine absorbs the raw volume — then per-op
mean/stddev over that tiny frame via an unpartitioned-by-volume
window (|ops| × |buckets| rows, thousands at most regardless of log
size). The corpus-sized input is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import round_half_up


def op_rate_anomalies(
    log: DataFrame,
    op_col: str = "op",
    ts_col: str = "ts",
    bucket: str = "hour",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Flag time buckets whose event count for an operation deviates
    more than ``z_threshold`` population standard deviations from that
    operation's mean bucket rate.

    Returns one row per ``(op, bucket_ts)``: ``(op, bucket_ts,
    n_events, mean_rate, z_score, anomalous)`` — all buckets, flagged
    not filtered, so a dashboard sees the base rate too. ``z_score``
    is NULL (and ``anomalous`` false) when an op's rate is perfectly
    flat (stddev 0): a constant stream has no scale for deviation.

    Statistics use ``stddev_pop`` (population), which both Spark and
    DuckDB define identically — the sample variant's n−1 denominator
    is an arbitrary choice for a complete (not sampled) log. Floats
    rounded to 4 decimals (half-up).

    Empty buckets are GAP-FILLED: every op gets a row for every bucket
    in the log's global time range, with ``n_events = 0`` — a total
    outage is the loudest anomaly there is, and a groupBy alone would
    silently omit exactly those buckets. The grid is |ops| × |buckets|
    rows built from one 1-row min/max aggregate — never corpus-sized.
    """
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    observed = (
        log.select(F.col(op_col).alias("op"), b.alias("_b"))
        .groupBy("op", "_b")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    span = log.agg(
        F.date_trunc(bucket, F.min(F.col(ts_col).cast("timestamp"))).alias("_lo"),
        F.date_trunc(bucket, F.max(F.col(ts_col).cast("timestamp"))).alias("_hi"),
    )
    grid = (
        log.select(F.col(op_col).alias("op"))
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "op",
            F.explode(
                F.expr(f"sequence(_lo, _hi, interval 1 {bucket})")
            ).alias("_b"),
        )
    )
    per = grid.join(observed, ["op", "_b"], "left").select(
        "op", "_b", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    w = Window.partitionBy("op")
    mean = F.avg("n_events").over(w)
    sd = F.stddev_pop("n_events").over(w)
    z = F.when(sd > 0, (F.col("n_events") - mean) / sd)
    return per.select(
        "op",
        F.date_format("_b", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_events",
        round_half_up(mean, 4).alias("mean_rate"),
        round_half_up(z, 4).alias("z_score"),
        F.coalesce(
            F.abs(z) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("anomalous"),
    )
