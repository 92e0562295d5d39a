"""Per-epoch CDC-consumer hooks for the streaming tail.

Every incremental consumer in the engine follows one contract: advance
a destination from the source table's snapshot span, keyed by the
destination's OWN exactly-once ledger (so a crash between the epoch's
merge and the consumer sync — or a multi-epoch consumer outage —
self-heals on the next epoch: the sync diffs across everything
missed, and a retried epoch's re-sync is a no-op).

A consumer here is a callable ``(src: SnapshotTable, head: int) ->
None``; the factories below wrap each incremental operator in that
shape so ``StreamingReplay(engine, consumers=[...])`` tails the
stream end-to-end: lake upsert + any number of derived tables
(materialized rollups, secondary indexes, replicas) with no full
recompute anywhere.
"""

from __future__ import annotations

from typing import Callable

from ..lakehouse import SnapshotTable

Consumer = Callable[[SnapshotTable, int], None]


def _last_synced(dst: SnapshotTable) -> int | None:
    return max((r[1] for r in dst.applied_ranges()), default=None)


def rollup_consumer(dst: SnapshotTable, rollup_fn=None, key: str = "conv_id") -> Consumer:
    """Materialized aggregate view (operators/rollup.py)."""
    from ..operators.rollup import incremental_rollup_sync

    def _sync(src: SnapshotTable, head: int) -> None:
        last = _last_synced(dst)
        if last != head:
            kw = {"rollup_fn": rollup_fn} if rollup_fn is not None else {}
            incremental_rollup_sync(src, dst, last, head, key=key, **kw)

    return _sync


def stats_consumer(
    stats: SnapshotTable, cols=None, approx: bool = False
) -> Consumer:
    """Incremental ANALYZE (operators/stats_sync.py): per-epoch the
    stats table re-profiles only the epoch's manifest-diff buckets, so
    the table's profile stays current under the tail at O(changed
    data) per epoch."""
    from ..operators.stats_sync import stats_sync

    def _sync(src: SnapshotTable, head: int) -> None:
        last = _last_synced(stats)
        if last != head:
            stats_sync(
                src, stats, cols, head, from_snapshot=last, approx=approx
            )

    return _sync


def conv_dedup_index_consumer(index: SnapshotTable, **params) -> Consumer:
    """Conversation near-dup signature index
    (operators/dedup_index.conv_index_sync): per-epoch only the
    epoch's changed conversations are re-signed, so near-dup pairs are
    servable from the index at any moment without re-minhashing the
    corpus. ``params`` pass through (shingle_n, num_hashes, bands,
    text_col, ...)."""
    from ..operators.dedup_index import conv_index_sync

    def _sync(src: SnapshotTable, head: int) -> None:
        last = _last_synced(index)
        if last != head:
            conv_index_sync(src, index, head, from_snapshot=last, **params)

    return _sync


def sft_export_consumer(dst: SnapshotTable, **params) -> Consumer:
    """Training data as a CDC consumer (operators/sft_sync.py): the
    SFT-example export re-windows ONLY the epoch's changed
    conversations and retracts examples whose target turn vanished —
    an always-fresh training set at O(changed convs) per epoch."""
    from ..operators.sft_sync import sft_sync

    def _sync(src: SnapshotTable, head: int) -> None:
        last = _last_synced(dst)
        if last != head:
            sft_sync(src, dst, head, from_snapshot=last, **params)

    return _sync


def secondary_index_consumer(index: SnapshotTable, col: str) -> Consumer:
    """Secondary value index (operators/secondary_index.py)."""
    from ..operators.secondary_index import secondary_index_sync

    def _sync(src: SnapshotTable, head: int) -> None:
        last = _last_synced(index)
        if last != head:
            secondary_index_sync(
                src, index, col, to_snapshot=head, from_snapshot=last
            )

    return _sync


EventConsumer = Callable[["DataFrame", tuple[int, int]], None]


def scd2_consumer(dim: SnapshotTable, key_cols, attr_cols=None) -> EventConsumer:
    """SCD2 versioned-history dimension (operators/scd.scd2_sync).

    Unlike the snapshot-span consumers above, an SCD2 dimension must
    consume EVENTS (a state diff collapses intermediate versions), so
    this is an EVENT consumer: the tail hands it each epoch's batch +
    lsn range and the dimension's own ledger makes an epoch retry a
    no-op. Exactly-once holds because foreachBatch redelivers an
    unacknowledged epoch from its checkpoint; a multi-epoch consumer
    outage heals from the WAL itself (CLI `scd2-sync --from-lsn`), not
    from later epochs — events, not state, are the recovery source."""
    from ..operators.scd import scd2_sync

    def _sync(batch, rng: tuple[int, int]) -> None:
        scd2_sync(dim, batch, rng, key_cols=key_cols, attr_cols=attr_cols)

    return _sync


def dpo_consumer(state: SnapshotTable, **params) -> EventConsumer:
    """Incremental DPO preference mining (operators/dpo_sync.py).

    Like SCD2, the information lives only in EVENTS (the final table
    never holds superseded texts), so this is an event consumer: each
    epoch's lsn-contiguous slice folds into the per-key state; pairs
    serve from state via ``dpo_pairs`` without rereading the log."""
    from ..operators.dpo_sync import dpo_sync

    def _sync(batch, rng: tuple[int, int]) -> None:
        dpo_sync(state, batch, rng, **params)

    return _sync


def replica_consumer(dst: SnapshotTable) -> Consumer:
    """Cross-lakehouse replica (plans/replicate.py)."""
    from ..plans.replicate import replicate_incremental

    def _sync(src: SnapshotTable, head: int) -> None:
        last = _last_synced(dst)
        if last != head:
            replicate_incremental(
                src, dst, to_snapshot_id=head, from_snapshot_id=last
            )

    return _sync


__all__ = [
    "Consumer",
    "EventConsumer",
    "rollup_consumer",
    "secondary_index_consumer",
    "scd2_consumer",
    "replica_consumer",
]
