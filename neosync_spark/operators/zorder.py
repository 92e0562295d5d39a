"""Z-order (Morton) multi-column clustering for compaction — the
data-skipping layout Delta's OPTIMIZE ZORDER BY and Iceberg's
sort-order rewrite provide: interleave the bits of per-column rank
buckets so that sorting by the interleaved value co-locates rows that
are close in EVERY clustered dimension, and per-file zone maps then
prune scans filtered on ANY of them (a plain sort only serves its
leading column).

Public method (Morton 1966; Delta/Iceberg docs describe the same
recipe). No reference counterpart — Neosync's sink is an OLTP row
store; file clustering is a lakehouse concern.

Scale shape: one ``approxQuantile`` pass per clustering column
(driver-frozen cutpoints — a pure function of the data, stable across
retries), then the z-value is a pure JVM expression (comparison chain
+ shift/OR interleave) evaluated inside the compaction write's
``sortWithinPartitions``. No shuffle beyond the one the compactor
already does; no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _to_double(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col)).cast("double")
    if isinstance(dt, T.StringType):
        raise ValueError(
            f"zorder: column {col!r} is a string — hashing a string has "
            "no range locality, so z-ordering it cannot help zone maps; "
            "cluster on a numeric/timestamp column instead"
        )
    return F.col(col).cast("double")


def zorder_bounds(
    df: DataFrame, cols: Sequence[str], bits: int = 4
) -> dict[str, list[float]]:
    """Equi-depth cutpoints per clustering column (2^bits buckets),
    frozen on the driver via approxQuantile — equi-depth, unlike
    equal-width, keeps bucket populations balanced under skew, which
    is what makes the interleaved order actually separate files."""
    if not 1 <= bits <= 8:
        raise ValueError("zorder: bits must be in [1, 8]")
    n = 1 << bits
    casted = df.select(*[_to_double(df, c).alias(c) for c in cols])
    qs = [i / n for i in range(1, n)]
    # ONE multi-column approxQuantile call: one job over the input,
    # not one per clustered column
    all_cuts = casted.stat.approxQuantile(list(cols), qs, 0.001)
    return {c: sorted(set(cuts)) for c, cuts in zip(cols, all_cuts)}


def zorder_expr(
    df: DataFrame,
    bounds: dict[str, list[float]],
    bits: int = 4,
) -> Column:
    """The Morton value as a pure JVM Column: per column, bucket =
    #cutpoints below the value (NULLs bucket 0, sorting first, like a
    SQL NULLS FIRST); then bit i of column j lands at position
    ``i·ncols + j`` of the z-value — j follows the CALLER's column
    order (``bounds`` insertion order), so the first-listed column
    takes the lower interleave position, as Delta's ZORDER BY does."""
    cols = list(bounds)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = _to_double(df, c)
        b = F.lit(0)
        for cut in bounds[c]:
            b = b + (v > F.lit(float(cut))).cast("int")
        b = F.coalesce(b, F.lit(0)).cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return z


def zorder_sort_key(
    df: DataFrame, cols: Sequence[str], bits: int = 4
) -> Column:
    """One-call form: freeze the cutpoints on ``df`` and return the
    z-value Column for it (what ``SnapshotTable.compact`` uses)."""
    return zorder_expr(df, zorder_bounds(df, cols, bits), bits)
