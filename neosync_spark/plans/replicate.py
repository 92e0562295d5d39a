"""Incremental cross-lakehouse replication by snapshot diff.

A replica in another region/cluster should not re-run the whole CDC
pipeline (log scan + LWW + anonymization UDFs) — the primary already
did that work. ``replicate_incremental`` ships the primary's NET
row-level changes between two snapshots (``snapshot_diff`` — a
bucket-pruned manifest comparison, work ∝ changed buckets) and applies
them to the replica through the ordinary ledgered merge, so:

- a re-run of the same replication hop is a no-op (the replica's
  ledger keys on the (from, to) snapshot pair);
- hops compose: 0→5 then 5→9 equals 0→9 equals the primary's state
  (tests pin all three);
- the replica is a plain SnapshotTable — point reads, time travel,
  checksum verification (``operators/checksum.py``) all apply.

Ordering: like rollup/join-view syncs, each hop's events carry the
TARGET snapshot id as a monotone (ts, lsn) ordinal — later hops always
win LWW on the replica, regardless of event-time disorder inside the
primary's history. The reference's closest analog is re-running the
whole sync against a second destination (workflow.go fan-out); this is
the O(changes) version.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import CommitInfo, SnapshotTable


def replica_schema(src_schema: T.StructType) -> T.StructType:
    """Replica table schema for a primary schema: the primary's event
    time becomes payload (``src_ts`` — a delete's pre-image ts can move
    BACKWARD, so it cannot order the replica's merges) and ``ts`` is
    the hop ordinal the sync owns."""
    fields = [f for f in src_schema.fields if f.name != "ts"]
    return T.StructType(
        fields
        + [
            T.StructField("src_ts", T.TimestampType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )


def replicate_incremental(
    src: SnapshotTable,
    dst: SnapshotTable,
    to_snapshot_id: int,
    from_snapshot_id: int | None = None,
) -> CommitInfo:
    """Advance ``dst`` to mirror ``src`` at ``to_snapshot_id``.

    ``from_snapshot_id=None`` bulk-loads the full state at the target
    snapshot (the bootstrap hop); otherwise only the net diff moves.
    The replica must share the primary's key columns and payload
    schema (create it from ``src.current_schema()``)."""
    applied_range = (from_snapshot_id or 0, to_snapshot_id)
    if applied_range[0] == applied_range[1] or dst.is_applied(*applied_range):
        return CommitInfo(
            dst.manifest(refresh=True)["snapshot_id"], 0, 0, applied_range
        )
    payload = [f.name for f in src.current_schema().fields if f.name != "ts"]
    ordinal_ts = F.timestamp_seconds(F.lit(to_snapshot_id))
    lsn = F.lit(to_snapshot_id).cast("long")
    if from_snapshot_id is None:
        batch = (
            src.read(snapshot_id=to_snapshot_id)
            .select(*payload, F.col("ts").alias("src_ts"))
            .withColumn("op", F.lit("insert"))
        )
    else:
        diff = src.snapshot_diff(from_snapshot_id, to_snapshot_id)
        batch = diff.select(
            *payload,
            F.col("ts").alias("src_ts"),
            F.when(F.col("change_type") == "delete", F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
        )
    # src event time travels as payload (src_ts); the hop ordinal owns
    # the replica's LWW order
    batch = (
        batch.withColumn("ts", ordinal_ts).withColumn("lsn", lsn)
    )
    return dst.merge_cdc(batch, applied_range=applied_range)
