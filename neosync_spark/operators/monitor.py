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

from ..util import literal_frame, round_half_up


def lsn_gaps(
    df: DataFrame,
    lsn_col: str = "lsn",
    block: int = 4096,
    broadcast_suspects: bool = True,
) -> DataFrame:
    """Exact LSN-continuity audit: every missing run of sequence numbers
    strictly between the observed min and max, as (gap_lo, gap_hi,
    n_missing) — the check a WAL/binlog consumer runs to prove no
    change event was lost in transport (the reference trusts its SQL
    cursor; a log shipped through a broker cannot).

    Scale shape (10^10 events): a global sort of raw events would be
    the naive plan; instead phase 1 is ONE hash aggregation down to
    per-block rows (block = lsn DIV ``block``; count-distinct absorbs
    at-least-once duplicate deliveries), phase 2a finds CROSS-block
    gaps with a lag window over the tiny block table (N/block rows),
    and phase 2b sorts ONLY inside blocks whose distinct count falls
    short of their own span — partitions of ≤``block`` rows. The
    corpus-sized input is scanned once and never globally sorted.

    The cross-block lag collapses the block table to one task, so size
    ``block`` ~ sqrt(max_lsn) to bound both phases: 10^10 lsns at
    block=10^5 is a 10^5-row driver-sized block table and ≤10^5-row
    suspect partitions. The default suits logs up to ~10^8 lsns.
    """
    lsn = F.col(lsn_col).cast("long")
    blk = F.floor(lsn / F.lit(float(block))).cast("long")
    per_block = (
        df.select(blk.alias("_blk"), lsn.alias("_lsn"))
        .groupBy("_blk")
        .agg(
            F.count_distinct(F.col("_lsn")).alias("_n"),
            F.min("_lsn").alias("_lo"),
            F.max("_lsn").alias("_hi"),
        )
    )
    # 2a: gaps BETWEEN consecutive present blocks (covers fully-missing
    # blocks); the block table is small enough for one range sort
    w = Window.orderBy("_blk")
    edges = per_block.select(
        F.col("_hi").alias("_prev_hi"),
        F.lead("_lo").over(w).alias("_next_lo"),
    ).filter(F.col("_next_lo") > F.col("_prev_hi") + 1)
    cross = edges.select(
        (F.col("_prev_hi") + 1).alias("gap_lo"),
        (F.col("_next_lo") - 1).alias("gap_hi"),
        (F.col("_next_lo") - F.col("_prev_hi") - 1).alias("n_missing"),
    )
    # 2b: gaps INSIDE suspect blocks only — lag over ≤block-row groups
    suspect = per_block.filter(
        F.col("_n") < F.col("_hi") - F.col("_lo") + 1
    ).select("_blk")
    if broadcast_suspects:
        # healthy streams lose little: the suspect list is tiny; pass
        # False when auditing a log with pervasive loss
        suspect = F.broadcast(suspect)
    wb = Window.partitionBy("_blk").orderBy("_lsn")
    intra = (
        df.select(blk.alias("_blk"), lsn.alias("_lsn"))
        .join(suspect, "_blk", "left_semi")
        .dropDuplicates(["_blk", "_lsn"])
        .select("_blk", "_lsn", F.lead("_lsn").over(wb).alias("_nxt"))
        .filter(F.col("_nxt") > F.col("_lsn") + 1)
        .select(
            (F.col("_lsn") + 1).alias("gap_lo"),
            (F.col("_nxt") - 1).alias("gap_hi"),
            (F.col("_nxt") - F.col("_lsn") - 1).alias("n_missing"),
        )
    )
    return cross.unionByName(intra)


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


def _hash_bucket(col, n_buckets: int):
    """md5-derived value bucket, identical in Spark and DuckDB:
    Spark  conv(substr(md5(v),1,8),16,10) % B
    DuckDB ('0x' || substr(md5(v),1,8))::BIGINT % B
    NULLs get their own bucket (B)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return F.when(col.isNull(), F.lit(n_buckets)).otherwise(
        F.pmod(h, F.lit(n_buckets))
    )


def column_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    cols: "list[str]",
    n_buckets: int = 64,
    alpha: float = 0.5,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Per-column distribution drift between two table states —
    Population Stability Index over md5-hash value buckets, the check a
    CDC pipeline runs between yesterday's and today's snapshot (or
    between the source replica and the lake) to catch a schema-silent
    upstream change: a column whose VALUES moved (an app release that
    changed enum casing, a locale change in generated text, a default
    flipping to NULL) without any DDL event.

    Hash buckets, not value ranges, so one definition covers strings
    and numerics and no driver-side quantile pass is needed; with
    B + 1 buckets (NULL gets its own — NULL-rate drift is the most
    common real incident) PSI detects mass movement between any two
    fixed value groups. Laplace smoothing (``alpha``) keeps the PSI
    finite when a bucket is empty on one side.

    Scale shape: each side is ONE pass — the |cols| per-row values are
    exploded to (col, bucket) pairs AFTER a hash-agg-friendly
    projection, then a single groupBy(col, bucket) with map-side
    combine; the join that pairs the two sides is over the tiny
    (|cols| × (B+1)) histogram frame. Output: one row per column,
    ``(col_name, n_a, n_b, psi, drifted)``, deterministic and
    DuckDB-replayable (md5 buckets + explicit half-up rounding).
    """
    if not cols:
        raise ValueError("column_drift needs at least one column")

    def hist(df: DataFrame, side: str) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    _hash_bucket(F.col(c), n_buckets).alias("bucket"),
                )
                for c in cols
            ]
        )
        return (
            df.select(F.explode(pairs).alias("p"))
            .groupBy(
                F.col("p.col_name").alias("col_name"),
                F.col("p.bucket").alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    ha, hb = hist(df_a, "a"), hist(df_b, "b")
    # dense (col, bucket) grid so empty-on-one-side buckets still
    # contribute their smoothed term — |cols| × (B+1) rows, tiny
    grid = (
        ha.sparkSession.range(n_buckets + 1)
        .select(F.col("id").cast("int").alias("bucket"))
        .crossJoin(
            literal_frame(
                ha.sparkSession, [(c,) for c in cols], "col_name string"
            )
        )
    )
    j = (
        grid.join(ha, ["col_name", "bucket"], "left")
        .join(hb, ["col_name", "bucket"], "left")
        .select(
            "col_name",
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = Window.partitionBy("col_name")
    denom_extra = float(alpha) * (n_buckets + 1)
    p = (F.col("n_a") + F.lit(float(alpha))) / (
        F.sum("n_a").over(tot) + F.lit(denom_extra)
    )
    q = (F.col("n_b") + F.lit(float(alpha))) / (
        F.sum("n_b").over(tot) + F.lit(denom_extra)
    )
    per_bucket = j.select(
        "col_name",
        F.col("n_a"),
        F.col("n_b"),
        ((p - q) * F.log(p / q)).alias("_term"),
    )
    out = per_bucket.groupBy("col_name").agg(
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.sum("_term").alias("_psi"),
    )
    return out.select(
        "col_name",
        "n_a",
        "n_b",
        round_half_up(F.col("_psi"), 4).alias("psi"),
        (F.col("_psi") > F.lit(float(psi_threshold))).alias("drifted"),
    )


def replication_lag(
    log: DataFrame,
    table,
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    key_col: str = "conv_id",
) -> DataFrame:
    """How far behind the live WAL this table is — the consumer-lag /
    freshness report every CDC deployment watches (Kafka's consumer
    lag, Debezium's MilliSecondsBehindSource), which the reference has
    no analog for because its syncs are one-shot jobs.

    One row: ``applied_lsn_hi`` (the table ledger's exclusive
    high-water W), ``events_behind`` / ``convs_behind`` (pending
    volume), ``log_lsn_hi``, ``oldest/newest_pending_ts``, and
    ``lag_seconds`` = newest pending event time minus the newest
    APPLIED event time.

    Scale shape (10^10 applied events, small pending tail): the
    applied side is never scanned — W comes from the ledger and the
    applied freshness high-water from the table's per-file zone maps
    (``stats_high_water``: O(files) manifest metadata; sound because
    LWW ranks by ts first, so every key's winner carries its max ts
    and the global max over winners+tombstones equals the max applied
    event time). The log is scanned once with ``lsn >= W`` pushed into
    the parquet reader, so row groups wholly below W are skipped via
    footer stats and only the pending tail is read. One map-side-
    combined global aggregate; no shuffle wider than the partials.
    """
    import datetime

    w = table.last_applied_lsn()
    w = int(w) if w is not None else 0
    applied_hi = table.stats_high_water(ts_col)
    if isinstance(applied_hi, datetime.datetime):
        if applied_hi.tzinfo is not None:
            applied_hi = applied_hi.astimezone(
                datetime.timezone.utc
            ).replace(tzinfo=None)
        applied_hi = int(
            (applied_hi - datetime.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        )
    if key_col not in log.columns:
        raise ValueError(f"log has no key column {key_col!r}")
    pending = log.filter(F.col(lsn_col) >= F.lit(w))
    return pending.agg(
        F.lit(w).alias("applied_lsn_hi"),
        F.count(F.lit(1)).alias("events_behind"),
        F.countDistinct(key_col).alias("convs_behind"),
        F.max(lsn_col).alias("log_lsn_hi"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
            "oldest_pending_ts_s"
        ),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
            "newest_pending_ts_s"
        ),
        (
            F.lit(None).cast("long")  # nothing applied yet: lag undefined
            if applied_hi is None
            else F.when(F.count(F.lit(1)) == 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    (
                        # NTZ inputs cast through TIMESTAMP (session UTC)
                        F.unix_micros(F.max(ts_col).cast("timestamp"))
                        - F.lit(applied_hi)
                    )
                    / F.lit(1_000_000.0)
                )
            )
        ).alias("lag_seconds"),
    )
