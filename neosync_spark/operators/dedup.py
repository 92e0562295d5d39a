"""Last-writer-wins dedup — the single load-bearing ordering op.

The reference achieves LWW implicitly: rows stream in source order and
`ON CONFLICT DO UPDATE` makes the latest write win per PK
(/root/reference/worker/pkg/benthos/sql/output_sql_insert.go:187-191).
Our engine makes it explicit and distributed: one winner per key by
descending (ts, lsn).

Two physical strategies:

* ``lww_dedup`` (default) — groupBy(key).agg(max_by(struct(all cols),
  struct(order cols))). Catalyst plans this as partial + final hash
  aggregation, so a hot key (millions of updates to one turn) is
  collapsed map-side BEFORE the shuffle — the skew-resistant plan at
  10^10 events. No salting needed: partial combine IS the skew split.
* ``lww_dedup_window`` — row_number over (key order by ts desc,lsn desc).
  Shuffles every duplicate to one partition per key; kept for parity
  testing and for when the full ranked history is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """One row per key: the row with the max (order_cols) tuple.

    Ties on the full order tuple (at-least-once duplicate delivery
    re-emits identical rows) resolve to one of the identical copies.
    """
    other = [c for c in df.columns if c not in key_cols]
    payload = F.struct(*[F.col(c) for c in other])
    rank = F.struct(*[F.col(c) for c in order_cols])
    agg = df.groupBy(*key_cols).agg(F.max_by(payload, rank).alias("_w"))
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in other])


def lww_dedup_window(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Window-ranked variant (row_number == 1)."""
    order = [F.col(c).desc() for c in order_cols] + [
        F.col(c).desc() for c in tiebreak_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
