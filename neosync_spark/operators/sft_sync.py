"""Incremental SFT-example export — training data as a CDC consumer.

``sft_examples`` (operators/conversations.py) converts final
conversation states into supervised fine-tuning pairs; THIS module
keeps that export continuously current under the CDC tail, at
O(changed conversations) per epoch — the piece that turns a 10^10-event
transcript feed into an always-fresh training set without ever
re-exploding the whole corpus.

Mechanics per epoch (mirrors ``conv_index_sync``,
operators/dedup_index.py — the shared shape for conversation-granular
tail consumers):

- changed conversations come from ``snapshot_diff`` (bucket-pruned
  manifest comparison);
- their CURRENT turns are re-read (changed buckets only, semi-joined
  to the changed conv set) and re-windowed through the same
  ``sft_examples`` fold — one conversation's examples are keyed
  ``(conv_id, turn_idx)`` of the target turn, so regeneration
  atomically replaces them;
- examples whose target turn no longer exists (turn deleted, role
  changed away from ``target_role``, text gone NULL, or the whole
  conversation removed) are retracted by anti-joining the export's
  OWN current rows for the changed conversations (bucket-pruned via
  the export table's key hash) against the fresh set;
- the merge is ledgered by ``(from, to)`` snapshot span — replaying a
  crashed epoch is a no-op, and a consumer outage heals by diffing
  across everything missed.

Invariant (oracled in the gate): after ANY epoch partitioning of the
log, the export equals the single-shot ``sft_examples`` over the final
table state — the query the ``transcript_sft_examples`` DuckDB oracle
already replays.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import CommitInfo, SnapshotTable, bucket_expr

SFT_EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("n_context_turns", T.LongType()),
        T.StructField("context_chars", T.LongType()),
        T.StructField("context", T.StringType()),
        T.StructField("target", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def create_sft_export(
    spark: SparkSession, path: str, n_buckets: int = 64
) -> SnapshotTable:
    """An empty SFT-example export keyed ``(conv_id, turn_idx)``."""
    return SnapshotTable.create(
        spark,
        path,
        SFT_EXPORT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        order_cols=["ts"],
        n_buckets=n_buckets,
    )


def sft_sync(
    src: SnapshotTable,
    dst: SnapshotTable,
    to_snapshot: int,
    from_snapshot: int | None = None,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    context_budget_chars: int = 2048,
    target_role: str = "assistant",
) -> CommitInfo:
    """Advance the SFT export to describe ``src`` at ``to_snapshot``."""
    from ..operators.conversations import sft_examples
    from ..operators.stats_sync import changed_buckets

    applied_range = (from_snapshot or 0, to_snapshot)
    if from_snapshot == to_snapshot or dst.is_applied(*applied_range):
        return CommitInfo(
            dst.manifest(refresh=True)["snapshot_id"], 0, 0, applied_range
        )

    if from_snapshot is None:
        state = src.read(snapshot_id=to_snapshot)
        changed = None
    else:
        bs = changed_buckets(src, from_snapshot, to_snapshot)
        changed = (
            src.snapshot_diff(from_snapshot, to_snapshot)
            .select(F.col(conv_col).alias("_cc"))
            .distinct()
            .persist()
        )
        state = src.read(snapshot_id=to_snapshot, buckets=bs).join(
            F.broadcast(changed),
            F.col(conv_col) == F.col("_cc"),
            "left_semi",
        )

    fresh = sft_examples(
        state,
        conv_col=conv_col,
        turn_col=turn_col,
        role_col=role_col,
        text_col=text_col,
        context_budget_chars=context_budget_chars,
        target_role=target_role,
    )

    ordinal = dst.sync_ordinal()
    lo = int(applied_range[0])
    upserts = fresh.select(
        F.lit("insert").alias("op"),
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("long").alias("turn_idx"),
        "n_context_turns",
        "context_chars",
        "context",
        "target",
        F.timestamp_seconds(F.lit(ordinal)).alias("ts"),
        F.lit(lo).alias("lsn"),
    )
    batch = upserts
    if changed is not None:
        # retract exported examples whose target turn vanished: the
        # export's own rows for the changed convs (bucket-pruned via
        # its key hash — the changed conv set is bounded per epoch)
        m = dst.manifest(refresh=True)
        dbuckets = sorted(
            r[0]
            for r in changed.select(
                bucket_expr("_cc", m["bucket_count"]).alias("b")
            )
            .distinct()
            .collect()
        )
        mine = dst.read(buckets=dbuckets).join(
            F.broadcast(changed),
            F.col("conv_id") == F.col("_cc"),
            "left_semi",
        )
        stale = mine.join(
            fresh.select(
                F.col(conv_col).alias("conv_id"),
                F.col(turn_col).cast("long").alias("turn_idx"),
            ),
            ["conv_id", "turn_idx"],
            "left_anti",
        )
        deletes = stale.select(
            F.lit("delete").alias("op"),
            "conv_id",
            "turn_idx",
            F.lit(None).cast("long").alias("n_context_turns"),
            F.lit(None).cast("long").alias("context_chars"),
            F.lit(None).cast("string").alias("context"),
            F.lit(None).cast("string").alias("target"),
            F.timestamp_seconds(F.lit(ordinal)).alias("ts"),
            F.lit(lo).alias("lsn"),
        )
        batch = upserts.unionByName(deletes)
    info = dst.merge_cdc(batch, applied_range=applied_range, lineage=False)
    if changed is not None:
        changed.unpersist()
    return info
