"""As-of (point-in-time) join — match each left row to the most
recent right row at or before its timestamp, per key. The PIT
enrichment every event pipeline needs (attach the prevailing
dimension version / rate / state to each event) and a classic gap in
Spark's join surface: SQL expresses it only as an O(n·m) inequality
join + argmax, which Catalyst plans as a broadcast nested loop.

This implementation is the union-merge trick (public folklore, same
shape pandas ``merge_asof`` and kdb's ``aj`` define): tag both sides,
sort per key by (ts, side) so each right row precedes the left rows
it can serve, and carry the right payload forward with one
``last(ignorenulls)`` window — ONE key shuffle, zero row expansion,
no Python. DuckDB's native ``ASOF JOIN`` provides the independent
oracle.

Scale shape: cost is a single hash exchange on the key plus a
per-key sort — the same bill as any windowed dedup; skewed keys can
reuse the engine's salting helpers upstream since the window is
per-key associative-scan-able. No broadcast of either side required.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    allow_exact_matches: bool = True,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the
    ``right_cols`` of the latest ``right`` row whose timestamp is
    ``<=`` (or ``<`` when ``allow_exact_matches=False``) the left
    row's, sharing the ``on`` key. Unmatched rows keep NULLs (LEFT
    semantics). ``tolerance_us`` bounds staleness: a match older than
    that many microseconds is discarded (pandas ``merge_asof``
    tolerance analog).

    Right columns arrive as ``{prefix}{col}`` plus ``{prefix}ts``
    (the matched timestamp). If several right rows share the maximal
    timestamp for a key, the LAST one in ``right``'s sort order for
    the tie-break columns wins deterministically only if the caller
    de-duplicates — pass a unique (key, ts) right side (e.g. LWW
    winners) as every PIT dimension table should be.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    for c in (*rcols, right_ts):
        if f"{prefix}{c if c != right_ts else 'ts'}" in left.columns:
            raise ValueError(f"asof_join: output column collision on {c!r}")

    lcols = [c for c in left.columns if c not in keys]
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.col(right_ts).alias("_r_ts"),
    )
    # at equal timestamps the right row must sort BEFORE the left rows
    # it may serve (exact matches allowed) or AFTER them (excluded)
    side_order = F.col("_side").desc() if allow_exact_matches else F.col("_side").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in rcols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
    )
    out = carried.filter(F.col("_side") == 0)
    if tolerance_us is not None:
        fresh = (
            F.unix_micros(F.col("_ats").cast("timestamp"))
            - F.unix_micros(F.col("_m_ts").cast("timestamp"))
        ) <= F.lit(int(tolerance_us))
        out = out.select(
            "*",
            *[
                F.when(fresh, F.col(f"_m_{c}")).alias(f"_f_{c}")
                for c in rcols
            ],
            F.when(fresh, F.col("_m_ts")).alias("_f_ts"),
        )
        matched = {c: f"_f_{c}" for c in rcols}
        matched_ts = "_f_ts"
    else:
        matched = {c: f"_m_{c}" for c in rcols}
        matched_ts = "_m_ts"
    return out.select(
        *[F.col(k) for k in keys],
        F.col("_ats").alias(left_ts),
        *[F.col(c) for c in lcols if c != left_ts],
        *[F.col(matched[c]).alias(f"{prefix}{c}") for c in rcols],
        F.col(matched_ts).alias(f"{prefix}ts"),
    )
