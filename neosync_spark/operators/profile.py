"""Table profiling — per-column null fraction, distinct cardinality
and min/max in ONE pass over the data. The standard pre-ingest /
post-sync audit surface (what a user runs before wiring mappings, and
after a sync to sanity-check the target): Neosync surfaces schema
metadata through its connection-data service
(backend/pkg/sqlmanager/), but value-level profiling is left to the
warehouse; a lakehouse engine should do it itself, distributed.

Scale shape: exactly one aggregation job regardless of column count.
``approx=False`` (the oracle-able default) plans Spark's
multi-count-distinct via one Expand — rows are replicated x|cols|
before the partial agg, which is the textbook exact-distinct cost and
fine up to ~10 columns of profile at a time. ``approx=True`` swaps in
``approx_count_distinct`` (HyperLogLog++), which needs NO Expand: every
statistic partial-aggregates map-side in a single pass — the 100 TB
path, with distinct counts within ``rsd`` relative error. min/max are
taken on the native type, then rendered to strings, so numeric columns
order numerically (not lexicographically).

The final stack from the one aggregated row to one-row-per-column is
an explode over a literal array — driver-negligible, no extra job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import round_half_up


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """One row per profiled column: ``(column, n_rows, n_nulls,
    null_frac, n_distinct, min_repr, max_repr)``.

    ``n_distinct`` ignores NULLs (both Spark's ``count(DISTINCT)`` and
    the SQL standard agree); ``null_frac`` is HALF_UP-rounded to 6
    places so the number replays identically in any engine;
    ``min_repr``/``max_repr`` are the native-type extremes cast to
    string AFTER aggregation (numeric columns order numerically).
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(names):
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"_nn_{i}"))
        if approx:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"_nd_{i}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"_nd_{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_mn_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_mx_{i}"))
    one = df.agg(*aggs)

    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{i}").alias("n_nulls"),
            F.col(f"_nd_{i}").alias("n_distinct"),
            F.col(f"_mn_{i}").alias("min_repr"),
            F.col(f"_mx_{i}").alias("max_repr"),
        )
        for i, c in enumerate(names)
    ]
    return (
        one.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .withColumn(
            "null_frac",
            round_half_up(
                F.col("n_nulls") / F.nullif(F.col("n_rows"), F.lit(0)), 6
            ),
        )
        .select(
            "column",
            "n_rows",
            "n_nulls",
            "null_frac",
            "n_distinct",
            "min_repr",
            "max_repr",
        )
    )


def numeric_percentiles(
    df: DataFrame,
    cols: Sequence[str],
    ps: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Percentile profile for numeric columns: one row per
    ``(column, p)`` with the linearly-interpolated quantile — the other
    half of a pre-mapping audit (value RANGES, where min/max alone hide
    skew and outliers).

    ``approx=False`` uses Spark's exact ``percentile`` (identical
    interpolation to ANSI ``quantile_cont``/DuckDB, so the number is
    engine-replayable bit-for-bit before rounding); exact percentiles
    materialize each column's values inside the aggregate — fine for an
    audit sample, wrong for 100 TB. ``approx=True`` swaps in
    ``percentile_approx`` (Greenwald-Khanna sketch): single pass,
    map-side partial aggregation, bounded memory — the at-scale path,
    within ``1/accuracy`` relative rank error. Both are ONE aggregation
    job for all columns; NULLs are ignored per SQL semantics (an
    all-NULL column yields NULL values).
    """
    names = list(cols)
    if not names:
        raise ValueError("numeric_percentiles needs at least one column")
    p_list = ", ".join(repr(float(p)) for p in ps)
    aggs = []
    for i, c in enumerate(names):
        if "`" in c:
            raise ValueError(f"illegal column name {c!r}")
        # backtick-quoted: 'order total' / 'price-usd' are legal parquet
        # names (profile_columns handles them via F.col; SQL text needs
        # the quoting)
        if approx:
            expr = f"percentile_approx(`{c}`, array({p_list}), {int(accuracy)})"
        else:
            expr = f"percentile(`{c}`, array({p_list}))"
        aggs.append(F.expr(expr).alias(f"_q_{i}"))
    one = df.agg(*aggs)
    per = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(float(p)).alias("p"),
            round_half_up(
                F.col(f"_q_{i}").getItem(j).cast("double"), 6
            ).alias("value"),
        )
        for i, c in enumerate(names)
        for j, p in enumerate(ps)
    ]
    return one.select(F.explode(F.array(*per)).alias("r")).select("r.*")
