"""Sessionization — gap-based event grouping.

Not in the reference (its unit is a table sync), but a core
transcript-analytics op for conversation logs: group a user's events
into sessions split by inactivity gaps.

* ``sessionize`` — batch: lag + running-sum window (deterministic,
  SQL-expressible, verified against DuckDB).
* ``sessionize_stream`` — streaming: watermark + ``session_window``
  aggregation (late events beyond the watermark are dropped by Spark's
  state store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Sessions per key: a new session starts when the gap since the
    previous event exceeds ``gap_seconds``. Output: one row per session
    with bounds and event count."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    # parquet may surface TIMESTAMP_NTZ; go via timestamp_ltz (session
    # TZ pinned to UTC) to epoch seconds
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    with_sess = df.withColumn(
        "session_idx",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sess.groupBy(key_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessions via the built-in session_window (state-store
    backed, watermark bounds late data)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
