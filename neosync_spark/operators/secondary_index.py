"""Secondary value index over a non-key column — point lookups by
payload value as a CDC consumer.

The lakehouse buckets by the LEADING key column, so ``read(
key_equals={"conv_id": ...})`` is already a pruned point lookup *by
key*. But "find every conversation that used tool X" filters a
PAYLOAD column: without an index it is a full corpus scan per query.
This module maintains a postings SnapshotTable keyed
``(<col>, <src key cols...>)`` — physically sharded BY VALUE (the
bucket key is the indexed column) with per-file value blooms — so a
lookup prunes to the value's hash bucket and bloom-surviving files,
touching posting lists, never the table. The primary fetch then reads
ONLY the hash buckets the matching keys live in (bucket ids derived
executor-side; the driver sees at most ``bucket_count`` integers).

Maintenance is a CDC-consumer sync (the ``rollup.py`` /
``join_view.py`` family): per epoch, ``snapshot_diff(...,
include_preimages=True)`` yields exactly the postings to add and —
via the update/delete PRE-images — the stale postings to retract, so
work is ∝ |diff|, never table size, and a mutated or deleted row can
never leave a dangling posting (the staleness hazard the append-only
text/minhash indexes document away). Re-running a sync is a no-op
through the destination ledger (exactly-once, same as event replay).

LWW ordinal: every emitted posting event carries the TARGET snapshot
id as both ``ts`` and ``lsn`` — monotone across syncs by construction
(a pre-image's event ts can be older than state it retracts and must
not order the index).

Reference analog: none (Neosync maintains no downstream structures);
this is the Hudi record-level-index / database secondary-index shape
expressed through the table format's own pruning machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import literal_frame
from ..lakehouse import CommitInfo, SnapshotTable, bucket_expr


def create_secondary_index(
    spark: SparkSession,
    path: str,
    src: SnapshotTable,
    col: str,
    n_buckets: int = 64,
    bloom: bool = True,
) -> SnapshotTable:
    """Empty postings table for ``src[col]``: keyed (col, *src keys),
    bucketed by the indexed VALUE; ``bloom=True`` adds per-file value
    blooms (within-bucket file skipping at lookup time, at a fixed
    sidecar-build job per commit — worth it once commits carry many
    files; bucket pruning alone already bounds the lookup)."""
    m = src.manifest(refresh=True)
    keys = list(m["key_cols"])
    if col in keys:
        raise ValueError(
            f"{col!r} is a key column — key lookups are already pruned; "
            "a secondary index only helps payload columns"
        )
    src_schema = src.current_schema()
    by_name = {f.name: f for f in src_schema.fields}
    if col not in by_name:
        raise ValueError(f"{col!r} not in source schema")
    fields = [T.StructField(col, by_name[col].dataType, True)]
    fields += [
        T.StructField(k, by_name[k].dataType, True) for k in keys
    ]
    fields.append(T.StructField("ts", T.TimestampType(), True))
    return SnapshotTable.create(
        spark,
        path,
        T.StructType(fields),
        key_cols=[col, *keys],
        order_cols=["ts"],
        n_buckets=n_buckets,
        bloom_cols=[col] if bloom else None,
    )


def secondary_index_sync(
    src: SnapshotTable,
    index: SnapshotTable,
    col: str,
    to_snapshot: int,
    from_snapshot: int | None = None,
) -> CommitInfo:
    """Advance the index to reflect ``src`` at ``to_snapshot``.

    ``from_snapshot=None`` is the initial full build (one pass over the
    state: every non-NULL value emits a posting). Otherwise the diff's
    post-images become posting upserts and its PRE-images (update
    pre-image / delete) become posting retractions — anti-joined
    against the new postings so an unchanged value never races its own
    re-insert inside one batch. NULL values carry no posting (a NULL→v
    change adds one, v→NULL retracts one). Replay is a no-op via the
    index ledger keyed ``(from, to)``."""
    keys = list(src.manifest(refresh=True)["key_cols"])
    applied_range = (from_snapshot or 0, to_snapshot)
    if from_snapshot == to_snapshot or index.is_applied(*applied_range):
        return CommitInfo(
            index.manifest(refresh=True)["snapshot_id"], 0, 0, applied_range
        )
    ts = F.timestamp_seconds(F.lit(to_snapshot))
    lsn = F.lit(to_snapshot).cast("long")
    if from_snapshot is None:
        postings = (
            src.read(snapshot_id=to_snapshot)
            .filter(F.col(col).isNotNull())
            .select(col, *keys)
            .withColumn("ts", ts)
            .withColumn("op", F.lit("insert"))
            .withColumn("lsn", lsn)
        )
        # an epoch's values hash across most buckets — the bucket
        # pre-pass would only add a full extra scan of the batch
        return index.merge_cdc(
            postings,
            applied_range=applied_range,
            source_is_raw=False,
            lineage=False,
            prune_buckets=False,
        )
    diff = src.snapshot_diff(
        from_snapshot, to_snapshot, include_preimages=True
    )
    new_p = (
        diff.filter(F.col("change_type").isin("insert", "update_postimage"))
        .filter(F.col(col).isNotNull())
        .select(col, *keys)
    )
    old_p = (
        diff.filter(F.col("change_type").isin("delete", "update_preimage"))
        .filter(F.col(col).isNotNull())
        .select(col, *keys)
    )
    inserts = new_p.withColumn("op", F.lit("insert"))
    # retract only postings the new state no longer claims — a value
    # that survived an update must not see delete+insert at one ordinal
    deletes = old_p.join(new_p, [col, *keys], "left_anti").withColumn(
        "op", F.lit("delete")
    )
    batch = (
        inserts.unionByName(deletes).withColumn("ts", ts).withColumn(
            "lsn", lsn
        )
    )
    return index.merge_cdc(
        batch,
        applied_range=applied_range,
        source_is_raw=False,
        lineage=False,
        prune_buckets=False,
    )


def secondary_lookup(
    src: SnapshotTable,
    index: SnapshotTable,
    col: str,
    values,
    snapshot_id: int | None = None,
    index_snapshot: int | None = None,
) -> DataFrame:
    """``src.read().filter(col IN values)`` served by the index.

    Scale shape: the postings read prunes to the values' hash buckets
    + bloom-surviving files (``key_equals`` on the index's leading
    key); the primary read is then pruned to the hash buckets of the
    MATCHING keys — derived executor-side, the driver collects at most
    ``bucket_count`` integers — and semi-joined to the exact key set
    (broadcast: a point lookup's posting set is small by assumption).
    The table is never scanned; neither are non-matching buckets."""
    vals = values if isinstance(values, (list, tuple)) else [values]
    keys = list(src.manifest(refresh=True)["key_cols"])
    postings = index.read(
        snapshot_id=index_snapshot, key_equals={col: list(vals)}
    ).select(*keys)
    m = src.manifest(snapshot_id)
    hit_buckets = sorted(
        int(r[0])
        for r in postings.select(
            bucket_expr(keys[0], m["bucket_count"]).alias("_b")
        )
        .distinct()
        .collect()
    )
    if not hit_buckets:
        return literal_frame(src.spark, [], src.current_schema(m))
    return src.read(snapshot_id, buckets=hit_buckets).join(
        F.broadcast(postings), keys, "left_semi"
    )


def load_secondary_index(spark: SparkSession, path: str) -> SnapshotTable:
    return SnapshotTable.load(spark, path)


__all__ = [
    "create_secondary_index",
    "secondary_index_sync",
    "secondary_lookup",
    "load_secondary_index",
]
