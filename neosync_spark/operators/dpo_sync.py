"""Incremental DPO preference mining — the change log's losing
versions harvested continuously on the tail.

``preference_pairs`` (operators/conversations.py) mines chosen/rejected
pairs from the FULL change log in one pass; THIS module maintains the
same answer incrementally as an EVENT consumer: the information lives
only in the log (the final table never holds superseded texts), so —
like SCD2 — a state diff cannot feed it; each epoch's lsn-contiguous
event slice folds into a per-key state table instead, and pairs are
served from state without ever rereading the log.

Per ``(conv_id, turn_idx)`` the state carries exactly what the batch
miner's answer depends on:

- the latest EVENT overall (``w_*`` — op/role decide liveness and
  target-role filtering),
- the latest VERSION (non-delete, non-NULL text: ``lv_*`` — its text
  is ``chosen`` while the key is alive),
- the latest version whose text differs from ``lv_x`` (``rj_*`` —
  ``rejected``; maintained by demoting the previous latest version
  whenever a DIFFERENT text arrives, which survives flip-flops
  A→B→A and delete→revive sequences: deletes touch ``w_*`` only),
- the distinct text set (``vs`` — ``n_versions``).

Events fold in WAL (``lsn``) order — the SCD2 doctrine
(operators/scd.py): "which version superseded which" for a binlog is
the COMMIT order, and the payload timestamp can disorder across
epochs, which a fold cannot repair. The batch twin is therefore
``preference_pairs(log, order_cols=("lsn",))``.

The fold is associative over lsn-ordered event slices, so epoch
boundaries are invisible: fold(state, epoch-events) == fold(∅, all
events). One JVM ``aggregate`` per touched key per epoch (no Python,
no window); the state merge is the destination's ordinary ledgered
LWW upsert, so a redelivered epoch is a no-op and out-of-order epochs
are rejected exactly like SCD2 (a fold, like a history, cannot
commute).

Invariant (oracled in the gate): after ANY epoch partitioning of the
log, ``dpo_pairs(state)`` equals the one-shot
``preference_pairs(log, order_cols=("lsn",))`` — replayed in DuckDB by
the lsn-ordered variant of the ``transcript_preference_pairs`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import CommitInfo, SnapshotTable

DPO_STATE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("w_op", T.StringType()),
        T.StructField("w_role", T.StringType()),
        T.StructField("w_x", T.StringType()),
        T.StructField("lv_x", T.StringType()),
        T.StructField("rj_x", T.StringType()),
        T.StructField("vs", T.ArrayType(T.StringType())),
        T.StructField("ts", T.TimestampType()),
    ]
)


def create_dpo_state(
    spark: SparkSession, path: str, n_buckets: int = 64
) -> SnapshotTable:
    """An empty preference-mining state keyed ``(conv_id, turn_idx)``."""
    return SnapshotTable.create(
        spark,
        path,
        DPO_STATE_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        order_cols=["ts"],
        n_buckets=n_buckets,
    )


_ACC_FIELDS = ("w_op", "w_role", "w_x", "lv_x", "rj_x", "vs")

# one event into the accumulator; `e` is the next event in WAL (lsn)
# order, `acc` the state so far. A "version" is a non-delete event
# with non-NULL text.
_FOLD_STEP = """
(acc, e) -> named_struct(
  'w_op', e.op,
  'w_role', e.role,
  'w_x', e.x,
  'lv_x', IF(e.op <> 'delete' AND e.x IS NOT NULL, e.x, acc.lv_x),
  'rj_x', IF(e.op <> 'delete' AND e.x IS NOT NULL
             AND acc.lv_x IS NOT NULL AND acc.lv_x <> e.x,
             acc.lv_x, acc.rj_x),
  'vs', IF(e.op <> 'delete' AND e.x IS NOT NULL
           AND NOT array_contains(acc.vs, e.x),
           array_append(acc.vs, e.x), acc.vs)
)
"""


def dpo_sync(
    dst: SnapshotTable,
    events: DataFrame,
    applied_range: tuple[int, int],
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    op_col: str = "op",
    lsn_col: str = "lsn",
) -> CommitInfo:
    """Fold one lsn-contiguous event slice into the preference state
    in WAL (lsn) order."""
    if dst.is_applied(*applied_range):
        return CommitInfo(
            dst.manifest(refresh=True)["snapshot_id"], 0, 0, applied_range
        )
    last = dst.last_applied_lsn()
    if last is not None and applied_range[0] < last:
        raise ValueError(
            f"dpo_sync requires lsn-contiguous in-order epochs: range "
            f"{applied_range} starts before the state's high-water "
            f"{last} and is not an exact replay"
        )
    batch = (
        events.groupBy(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).cast("long").alias("turn_idx"),
        )
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(lsn_col).cast("long").alias("o1"),
                        F.col(op_col).alias("op"),
                        F.col(role_col).alias("role"),
                        F.col(text_col).alias("x"),
                    )
                )
            ).alias("_es")
        )
    )
    # seed each touched key's fold with its existing state (epoch
    # boundaries must be invisible to the fold); the state read is
    # bucket-pruned via the epoch's touched key hashes (≤ bucket-count
    # integers collected, never keys)
    from ..lakehouse import bucket_expr

    batch = batch.persist()
    m = dst.manifest(refresh=True)
    dbuckets = sorted(
        r[0]
        for r in batch.select(
            bucket_expr("conv_id", m["bucket_count"]).alias("b")
        )
        .distinct()
        .collect()
    )
    stf = dst.read(buckets=dbuckets) if dbuckets else dst.read().limit(0)
    st = stf.select(
        "conv_id", "turn_idx", *[F.col(c).alias(f"_p_{c}") for c in _ACC_FIELDS]
    )
    joined = batch.join(st, ["conv_id", "turn_idx"], "left")
    init = (
        "named_struct("
        "'w_op', _p_w_op, 'w_role', _p_w_role, 'w_x', _p_w_x, "
        "'lv_x', _p_lv_x, 'rj_x', _p_rj_x, "
        "'vs', coalesce(_p_vs, array()))"
    )
    folded = joined.select(
        "conv_id",
        "turn_idx",
        F.expr(
            "aggregate(transform(_es, e -> named_struct("
            "  'op', e.op, 'role', e.role, 'x', e.x)), "
            f"{init}, {_FOLD_STEP})"
        ).alias("_a"),
    )
    ordinal = dst.sync_ordinal()
    lo = int(applied_range[0])
    upserts = folded.select(
        F.lit("insert").alias("op"),
        "conv_id",
        "turn_idx",
        *[F.col("_a")[c].alias(c) for c in _ACC_FIELDS],
        F.timestamp_seconds(F.lit(ordinal)).alias("ts"),
        F.lit(lo).alias("lsn"),
    )
    info = dst.merge_cdc(upserts, applied_range=applied_range, lineage=False)
    batch.unpersist()
    return info


def dpo_pairs(
    dst: SnapshotTable, target_role: str = "assistant"
) -> DataFrame:
    """Serve preference pairs from the maintained state: alive
    ``target_role`` keys with a superseded distinct text. Matches
    ``preference_pairs(full log, order_cols=("lsn",))``
    column-for-column (WAL-order doctrine — see the module note)."""
    return (
        dst.read()
        .filter(
            (F.col("w_op") != "delete")
            & (F.col("w_role") == target_role)
            & F.col("rj_x").isNotNull()
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("lv_x").alias("chosen"),
            F.col("rj_x").alias("rejected"),
            F.size("vs").cast("long").alias("n_versions"),
        )
    )
