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


def lateness_stats(
    log: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "lsn",
) -> DataFrame:
    """Event-time disorder metrics per key over a change log in ARRIVAL
    order (``order_col``, the lsn): an event is LATE when its event
    time is behind the running maximum event time of earlier arrivals
    for the same key; its lateness is how far behind (microseconds).

    This is the measurement a streaming tail needs to size its
    watermark: ``withWatermark(ts, delay)`` drops events later than
    ``delay`` behind the high-water mark, so ``max_lateness_us`` over a
    representative log slice IS the smallest safe delay (cf.
    ``streaming/stream.py``; the reference has no event-time notion —
    its sync applies rows in query order — but any binlog/WAL tail at
    scale sees cross-shard reordering).

    Scale shape: one shuffle on ``key_col`` (window high-water mark +
    hash-agg with map-side combine); microsecond integers end-to-end,
    so the numbers are exact in any engine. Returns one row per key:
    ``(key, n_events, n_late, max_lateness_us, sum_lateness_us)``.
    """
    per_event = _lateness_per_event(log, key_col, ts_col, order_col)
    return per_event.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("_late_us") > 0).cast("long")).alias("n_late"),
        F.max("_late_us").alias("max_lateness_us"),
        F.sum("_late_us").alias("sum_lateness_us"),
    )


def _lateness_per_event(
    log: DataFrame, key_col: str, ts_col: str, order_col: str
) -> DataFrame:
    """(key, _late_us) per event: microseconds behind the per-key
    running event-time high-water mark in arrival order (0 if on
    time)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hwm = F.max(ev).over(w)
    late_us = F.when(hwm > ev, hwm - ev).otherwise(F.lit(0).cast("long"))
    return log.select(F.col(key_col), late_us.alias("_late_us"))


def suggest_watermark(
    log: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "lsn",
    quantile: float = 0.999,
) -> dict:
    """Size the streaming watermark from a representative log slice:
    the smallest ``withWatermark`` delay that would have admitted a
    ``quantile`` fraction of this log's events. Returns a small dict
    (driver-side — this is a configuration decision, not a dataset):

    ``{"quantile": q, "lateness_us": exact-quantile lateness,
    "max_lateness_us": the zero-drop bound, "delay": "<N> seconds"}``

    ``delay`` is ``lateness_us`` rounded UP to whole seconds — ready
    to paste into ``withWatermark(ts, delay)`` (cf.
    ``streaming/stream.py``); ``quantile=1.0`` reproduces the
    max-lateness zero-loss setting. Exact percentile over the
    per-event lateness: the state is one long per event after the
    same single key shuffle ``lateness_stats`` pays.
    """
    if not 0.0 < quantile <= 1.0:
        raise ValueError("suggest_watermark: quantile must be in (0, 1]")
    per_event = _lateness_per_event(log, key_col, ts_col, order_col)
    row = per_event.agg(
        F.expr(f"percentile(_late_us, {quantile})").alias("q"),
        F.max("_late_us").alias("mx"),
    ).collect()[0]
    q_us = int(row["q"] or 0)
    secs = -(-q_us // 1_000_000)  # ceil
    return {
        "quantile": quantile,
        "lateness_us": q_us,
        "max_lateness_us": int(row["mx"] or 0),
        "delay": f"{secs} seconds",
    }
