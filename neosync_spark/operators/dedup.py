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


def patch_fold(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
    patch_col: str = "_patch",
    del_col: str = "_del",
) -> DataFrame:
    """Fold a per-key event history that mixes FULL row images
    (insert/update/delete) with PARTIAL updates (``patch_col`` true:
    a NULL payload column means "unchanged", non-NULL means "set") into
    one winner row per key — the MySQL-minimal-row-image / partial
    Debezium envelope case, where an update event carries only the
    columns that changed.

    Semantics (full-replay definition): order a key's events by the
    ``order_cols`` tuple. A full image sets every payload column
    (possibly to NULL); a patch sets exactly its non-NULL columns.
    Final column value = the value at the LATEST event that set it.
    Because a full image always sets every column, that is equivalently
    ``max_by(c) over (full events UNION patches where c IS NOT NULL)``
    — so the whole fold is ONE groupBy aggregate per key with a
    conditional rank per column: partial + final hash aggregation,
    map-side combine, the same skew-proof single shuffle as
    ``lww_dedup``. No window, no join, no second pass.

    Existence: the key is live iff its latest FULL image is not a
    delete — patches never resurrect a deleted key and never create a
    row (orphan patches with no full image are dropped). The emitted
    ``order_cols`` are the overall max event's (patches included), so a
    later merge's cross-batch LWW comparison stays correct. By the same
    token a patch can only be folded against state that already
    contains every earlier event for its key: per-key in-order delivery
    (which a binlog/WAL guarantees by LSN) — a patch older than
    already-applied state is ignored, exactly like any late event under
    ts-aware LWW.

    Note the encoding's inherent limit: a patch cannot set a column TO
    NULL (NULL means unchanged) — that is a property of the partial
    row-image format itself, not of this fold; senders express
    "set to NULL" as a full image.
    """
    rank = F.struct(*[F.col(c) for c in order_cols])
    is_patch = F.coalesce(F.col(patch_col), F.lit(False))
    full_rank = F.when(~is_patch, rank)
    aggs = [
        F.max_by(
            F.col(c), F.when(~is_patch | F.col(c).isNotNull(), rank)
        ).alias(c)
        for c in payload_cols
    ]
    # ordering state advances with EVERY event (patches included) and
    # is the max event's TUPLE (a late event may hold the max of one
    # order col but not the tuple); existence only with full images
    aggs.append(F.max(rank).alias("_ord"))
    aggs.append(F.max_by(F.col(del_col), full_rank).alias(del_col))
    aggs.append(F.max(F.when(~is_patch, F.lit(1))).alias("_has_full"))
    extra = [
        c
        for c in df.columns
        if c
        not in {*key_cols, *payload_cols, *order_cols, patch_col, del_col}
    ]
    aggs += [F.max_by(F.col(c), rank).alias(c) for c in extra]
    out = df.groupBy(*key_cols).agg(*aggs)
    deleted = F.coalesce(F.col(del_col), F.lit(False))
    out = out.select(
        *key_cols,
        # a tombstoned key carries no payload — a patch arriving after
        # the delete must not leak its value into the tombstone row
        *[
            F.when(~deleted, F.col(c)).alias(c)
            for c in payload_cols
        ],
        *[F.col(f"_ord.{c}").alias(c) for c in order_cols],
        del_col,
        "_has_full",
        *extra,
    )
    return out.filter(F.col("_has_full").isNotNull()).drop("_has_full")


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
