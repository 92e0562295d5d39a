"""Transaction-boundary-atomic apply — the CDC applier's txn buffer.

A WAL/binlog is transactional at the SOURCE: a consumer must never
publish a table state containing half of a source transaction (torn
write / read skew on the replica). The reference never faces this —
it syncs whole tables through per-dialect cursors
(/root/reference/worker/pkg/benthos/sql/input_sql_raw.go) — but a
change-event tail does, and the ecosystem-standard envelope carries
exactly the two fields needed: each data event names its transaction
id, and the transaction's declared event count is published with the
commit (Debezium's ``transaction.id`` / ``event_count`` transaction
metadata — public wire format). This module implements the standard
applier strategies over an (txn_id, txn_total) pair of columns:

* :func:`txn_complete_split` — partition a micro-batch into events of
  COMPLETE transactions (every declared event present → safe to apply)
  and events of TORN transactions (batch cut mid-txn, or in-progress
  transactions streamed by logical decoding) to hold back for a later
  batch. Handles arbitrarily INTERLEAVED streams.
* :func:`txn_safe_boundary` — for commit-contiguous logs (MySQL binlog
  writes each txn as one contiguous run at commit): the lowest LSN of
  any torn transaction in the slice, i.e. the point to snap the
  micro-batch end down to so holdback is never needed. The engine's
  ``EngineConfig.txn_cols`` uses this to align every checkpoint with a
  transaction boundary (see ``ReplayEngine._replay_txn_atomic``).

Scale shape (10^10 events): completeness is ONE hash aggregation on
txn_id — map-side combine collapses each partition's events to one row
per transaction, so the shuffle carries O(#transactions), not
O(#events). The torn set is bounded by transactions in flight at the
cut (tiny — source backends cap concurrent txns in the thousands), so
it broadcasts back and the event rows themselves never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def txn_complete_split(
    df: DataFrame,
    txn_col: str = "txn_id",
    total_col: str = "txn_total",
    broadcast_torn: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (applyable, held) by transaction completeness.

    A transaction is COMPLETE in the batch iff the number of its events
    present equals its declared total (``total_col``, stamped on every
    event by the source — the commit-time event count). Complete-txn
    events are safe to apply atomically; torn-txn events must be held
    and re-offered in a later batch once their missing events arrive
    (re-offering the full txn is an LWW no-op for rows already applied,
    so at-least-once holdback is safe).

    ``broadcast_torn=True`` (default) broadcasts the torn-txn id list —
    correct for the normal regime where torn txns are only those cut by
    the batch edge. Pass False when replaying a log with pathological
    torn density (e.g. a filtered log) to use shuffle joins instead.
    """
    counts = df.groupBy(txn_col).agg(
        F.count(F.lit(1)).alias("_seen"), F.max(total_col).alias("_total")
    )
    torn = counts.filter(F.col("_seen") < F.col("_total")).select(txn_col)
    if broadcast_torn:
        torn = F.broadcast(torn)
    applyable = df.join(torn, txn_col, "left_anti")
    held = df.join(torn, txn_col, "left_semi")
    return applyable, held


def txn_safe_boundary(
    batch: DataFrame,
    txn_col: str = "txn_id",
    total_col: str = "txn_total",
    lsn_col: str = "lsn",
) -> int | None:
    """For a commit-contiguous slice: the lowest LSN belonging to a torn
    transaction, or None when every transaction in the slice is
    complete. Snapping the batch end down to this value makes the
    applied range end exactly on a transaction boundary (all torn txns
    sit at the slice tail when the source writes each txn contiguously
    at commit, so everything below the returned LSN is complete).

    One aggregation job; the driver receives a single scalar.
    """
    row = (
        batch.groupBy(txn_col)
        .agg(
            F.count(F.lit(1)).alias("_seen"),
            F.max(total_col).alias("_total"),
            F.min(lsn_col).alias("_lo"),
        )
        .filter(F.col("_seen") < F.col("_total"))
        .agg(F.min("_lo").alias("safe"))
        .collect()[0]["safe"]
    )
    return None if row is None else int(row)
