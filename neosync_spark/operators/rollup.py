"""Incremental materialized-view maintenance over SnapshotTable.

A derived (rollup) table is kept in sync from ``snapshot_diff`` output
instead of recomputed from scratch: at 10^10 events a per-conversation
rollup touches only the conversations that changed between two
snapshots — work ∝ diff size, not table size. (Reference analog: none;
Neosync recomputes nothing downstream. This is the incremental-view
half of the Iceberg changelog-scan concept that `snapshot_diff`
provides the read side of.)

Scale shape: the diff is bucket-pruned by manifest comparison
(snapshot_diff), the touched-key set is a distinct projection of it,
the re-aggregation reads the source at the target snapshot SEMI-JOINED
to the touched keys (broadcast-able when the diff is small — AQE
decides), and the merge into the destination reuses the exactly-once
ledger with ``(from_snapshot, to_snapshot)`` as the applied range, so
re-running a sync is a no-op.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import CommitInfo, SnapshotTable

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_user_turns", T.LongType(), True),
        T.StructField("total_chars", T.LongType(), True),
        # max alive turn ts of the group — payload, NOT the LWW column
        T.StructField("last_ts", T.TimestampType(), True),
        # LWW ordering column for the derived table's own merges: a
        # SYNC ORDINAL (the source snapshot id as epoch seconds).
        # Snapshot ids are strictly increasing, so a later sync always
        # wins LWW for every key it touches. Using any event-derived
        # timestamp here is wrong: a delete's pre-image ts (or an
        # out-of-order source event) can move a key's watermark
        # BACKWARD between syncs, and the destination's ts-first LWW
        # would then silently drop the later sync's row.
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def conversation_rollup(state: DataFrame, key: str = "conv_id") -> DataFrame:
    """Per-conversation aggregate of an alive transcripts state — one
    hash-agg with map-side combine. Emits payload columns only; the
    sync layer owns the LWW ``ts`` ordinal."""
    return state.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user_turns"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("total_chars"),
        F.max("ts").alias("last_ts"),
    )


def incremental_rollup_sync(
    src: SnapshotTable,
    dst: SnapshotTable,
    from_snapshot_id: int | None,
    to_snapshot_id: int,
    rollup_fn: Callable[[DataFrame], DataFrame] = conversation_rollup,
    key: str = "conv_id",
) -> CommitInfo:
    """Advance ``dst`` to reflect ``src`` at ``to_snapshot_id``.

    ``from_snapshot_id=None`` is the initial full build. Otherwise:
    diff the snapshots → distinct touched keys → re-aggregate ONLY
    those keys from the to-snapshot state → upsert; keys whose group
    vanished become delete events. Every event of a sync carries
    ``ts = to_snapshot_id`` as epoch seconds and ``lsn =
    to_snapshot_id`` — a per-sync ordinal that is monotone across
    syncs by construction, so the destination's (ts, lsn) LWW can
    never judge a later sync stale (event-derived watermarks can move
    backward: a delete's pre-image ts is OLDER than the state it
    removes).

    The applied range is ``(from, to)`` in dst's ledger: re-running the
    same sync is a no-op (exactly-once, same as the event replay path).
    """
    applied_range = (from_snapshot_id or 0, to_snapshot_id)
    if from_snapshot_id == to_snapshot_id or dst.is_applied(*applied_range):
        return CommitInfo(
            dst.manifest(refresh=True)["snapshot_id"], 0, 0, applied_range
        )

    def _check(fresh: DataFrame) -> DataFrame:
        if "ts" in fresh.columns:
            raise ValueError(
                "rollup_fn must not emit a 'ts' column — the sync owns "
                "the LWW ordinal; name activity timestamps e.g. 'last_ts'"
            )
        return fresh

    ordinal = F.timestamp_seconds(F.lit(to_snapshot_id))
    state = src.read(snapshot_id=to_snapshot_id)
    if from_snapshot_id is None:
        fresh = _check(rollup_fn(state))
        batch = (
            fresh.withColumn("ts", ordinal)
            .withColumn("op", F.lit("insert"))
            .withColumn("lsn", F.lit(to_snapshot_id).cast("long"))
        )
        return dst.merge_cdc(batch, applied_range=applied_range)

    diff = src.snapshot_diff(from_snapshot_id, to_snapshot_id)
    touched = diff.select(key).distinct()
    fresh = _check(rollup_fn(state.join(touched, key, "left_semi")))
    upserts = fresh.withColumn("ts", ordinal).withColumn("op", F.lit("update"))
    vanished = touched.join(fresh.select(key), key, "left_anti")
    payload = [f for f in fresh.schema.fields if f.name != key]
    deletes = vanished.select(
        F.col(key),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in payload],
        ordinal.alias("ts"),
        F.lit("delete").alias("op"),
    )
    batch = upserts.unionByName(deletes).withColumn(
        "lsn", F.lit(to_snapshot_id).cast("long")
    )
    return dst.merge_cdc(batch, applied_range=applied_range)
