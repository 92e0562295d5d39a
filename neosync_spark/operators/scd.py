"""Slowly-changing-dimension type-2 history — versioned effective ranges.

The reference replays a change stream into the destination's CURRENT
state (`ON CONFLICT DO UPDATE`, worker/pkg/benthos/sql/
output_sql_insert.go:187-191) and separately exposes the raw event
stream; warehouses consuming a CDC feed almost always also want the
third shape — the Kimball type-2 dimension: one row per VERSION of a
key with an effective range [valid_from, valid_to) and an is_current
flag, deletes closing the last open range without emitting a row.

Spark-first plan: one hash shuffle on the key, a single window pass
(`lead` over (ts, lsn)) to close each version with the NEXT event's
ordinate, then a filter dropping delete events (they exist only to
close ranges). No self-join, no second shuffle: Catalyst plans the
row_number + lead over the same window spec as ONE Window operator.

Scale notes (10^10 events):
* The shuffle key is the full business key (e.g. (conv_id, turn_idx)),
  not the conversation — hot conversations spread over their turns.
* A key's whole version chain lands in one task (any SCD2 build needs
  that adjacency); chains are bounded by per-key update counts, not by
  corpus size. For pathological single-key firehoses, fold with
  `lww_dedup` first and keep only the latest k versions.
* At-least-once delivery re-emits identical events; `dedupe=True`
  collapses them BEFORE the window so a duplicate cannot fabricate a
  zero-width version.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts", "lsn"),
    attr_cols: Sequence[str] | None = None,
    op_col: str = "op",
    delete_op: str = "delete",
    dedupe: bool = True,
) -> DataFrame:
    """Build the type-2 history of a change log.

    Returns one row per non-delete event (a VERSION), with:
      * ``version_seq``  — 1-based ordinal of the event within its key
        (deletes consume a seq so the numbering matches the raw log),
      * ``valid_from_<o>`` / ``valid_to_<o>`` for each order column —
        the half-open effective range; ``valid_to_*`` NULL while open,
      * ``is_current``   — 1 for the key's live version (last event and
        not closed by a later delete), else 0.

    ``order_cols`` must be a total order per key ((ts, lsn) — the LWW
    ordinate used everywhere else in this engine).
    """
    attrs = list(
        attr_cols
        if attr_cols is not None
        else [c for c in df.columns if c not in (*key_cols, *order_cols, op_col)]
    )
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    if dedupe:
        # Identical re-deliveries share the full (key, order) tuple, so
        # they are ADJACENT under w's ordering: drop a row whose
        # predecessor has the same order tuple. Using the same window
        # spec keeps this a second Window op over the SAME exchange —
        # one shuffle total, vs the extra full-tuple shuffle a
        # dropDuplicates([*key, *order]) would plan.
        ord_struct = F.struct(*[F.col(c) for c in order_cols])
        df = (
            df.withColumn("_prev_ord", F.lag(ord_struct).over(w))
            .filter(~ord_struct.eqNullSafe(F.col("_prev_ord")))
            .drop("_prev_ord")
        )
    nxt = {c: F.lead(F.col(c)).over(w) for c in order_cols}
    versioned = df.select(
        *key_cols,
        F.row_number().over(w).cast("long").alias("version_seq"),
        *attrs,
        F.col(op_col).alias("change_op"),
        *[F.col(c).alias(f"valid_from_{c}") for c in order_cols],
        *[nxt[c].alias(f"valid_to_{c}") for c in order_cols],
    )
    first_order = order_cols[0]
    return versioned.filter(F.col("change_op") != F.lit(delete_op)).withColumn(
        "is_current",
        F.when(F.col(f"valid_to_{first_order}").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )


def scd2_current(history: DataFrame) -> DataFrame:
    """The current-state projection of an SCD2 history (is_current = 1).

    Equal to `lww_dedup` over the same log minus deleted keys — the
    equivalence is property-tested in tests/test_scd2.py.
    """
    return history.filter(F.col("is_current") == 1).drop(
        "is_current", *[c for c in history.columns if c.startswith("valid_to_")]
    )
