"""Change-log source — the engine's scan operator.

Replaces the reference's keyset-paginated cursor reads
(/root/reference/worker/pkg/benthos/sql/input_sql_raw.go:165-199: a
row-at-a-time lexicographic resume predicate with n(n+1)/2 bind args)
with a partitioned columnar scan: the lsn range predicate is pushed
down to the parquet scan (verify: PushedFilters in .explain), and
ordering is NOT materialized — the LWW aggregation downstream consumes
events order-free, so no global sort is ever paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ChangeLogSource:
    """A parquet-backed WAL/binlog tail."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def full(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def slice(self, lsn_lo: int, lsn_hi: int) -> DataFrame:
        """Events with lsn in [lsn_lo, lsn_hi) — predicate pushed to the
        scan; duplicates sharing an original's lsn land in the same
        slice, so at-least-once re-emissions are deduped in-batch."""
        return self.full().filter(
            (F.col("lsn") >= F.lit(lsn_lo)) & (F.col("lsn") < F.lit(lsn_hi))
        )

    def lsn_bounds(self) -> tuple[int, int] | None:
        row = self.full().agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            return None
        return int(row["lo"]), int(row["hi"])


def keyset_page(
    df: DataFrame,
    order_cols: list[str],
    after: tuple | None,
    limit: int,
) -> DataFrame:
    """Generic lexicographic keyset pagination — the reference's resume
    predicate ((c1>v1) OR (c1=v1 AND c2>v2) OR ...) as a DataFrame op
    (/root/reference/worker/pkg/select-query-builder/querybuilder.go:148-175).
    Kept for API parity / bounded-memory driver-side paging; the engine
    itself uses lsn-range slicing instead.
    """
    out = df
    if after is not None:
        pred = None
        for i, col in enumerate(order_cols):
            clause = F.col(col) > F.lit(after[i])
            for j in range(i):
                clause = (F.col(order_cols[j]) == F.lit(after[j])) & clause
            pred = clause if pred is None else (pred | clause)
        out = out.filter(pred)
    return out.orderBy(*[F.col(c).asc() for c in order_cols]).limit(limit)
