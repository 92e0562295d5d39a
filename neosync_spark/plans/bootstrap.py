"""Bootstrap-snapshot → tail handoff — how a CDC pipeline starts.

A change-event tail alone cannot initialize a replica: the log may not
reach back to the beginning of time. The standard bootstrap (Debezium
snapshot modes; the reference's one-shot full-table sync is exactly the
snapshot half, /root/reference/worker/pkg/benthos/sql/input_sql_raw.go)
is: take a consistent snapshot of the source at log position S, bulk-
load it, then tail the log from a RESUME position ``resume_lsn <= S``.
The overlap [resume_lsn, S] is re-delivered by design — resume markers
are conservative (broker offsets lag the snapshot's source position) —
so the handoff must be idempotent, not gap-free-by-luck.

Idempotency here is LWW, same as steady-state: each snapshot row
carries the (ts, lsn) stamp of the last change reflected in it, so a
re-delivered overlap event compares against the snapshot row exactly
as it would have against the true pre-snapshot state — overlap
re-applies are no-ops, post-snapshot events win precisely when they
won at the source. A delete re-delivered for a key the snapshot
already excludes is a no-op on an absent key.

Scale shape: the bulk load is ONE merge commit (empty target → pure
bucketed write, no read amplification); the tail is the normal
micro-batched engine. Nothing about the handoff adds a shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import EngineConfig, ReplayEngine, ReplayStats
from ..lakehouse import CommitInfo, SnapshotTable
from ..schema_registry import SchemaRegistry


@dataclass
class BootstrapStats:
    bootstrap: CommitInfo | None
    tail: ReplayStats


def bootstrap_then_tail(
    spark: SparkSession,
    table: SnapshotTable,
    snapshot: DataFrame,
    slicer,
    resume_lsn: int,
    lsn_hi: int,
    config: EngineConfig | None = None,
    transforms: dict | None = None,
    registry: SchemaRegistry | None = None,
) -> BootstrapStats:
    """Bulk-load ``snapshot`` (payload + ts + lsn columns; each row
    stamped with the last change it reflects — a source without
    per-row stamps stamps every row (snapshot_ts, S) and must use
    ``resume_lsn == S``), record the ledger watermark at
    ``resume_lsn``, then tail the log over [resume_lsn, lsn_hi].

    Crash-safe / re-runnable: if the bootstrap commit already exists in
    the ledger the bulk load is skipped (merge_cdc's exactly-once
    range check) and the tail resumes from wherever it left off.
    """
    cfg = config or EngineConfig()
    eng = ReplayEngine(
        spark, table, transforms=transforms, registry=registry, config=cfg
    )
    snap = snapshot
    if "op" not in snap.columns:
        snap = snap.withColumn("op", F.lit("insert"))
    info = table.merge_cdc(
        snap,
        applied_range=(0, resume_lsn),
        lineage=cfg.lineage,
        mode="cow",
        transform=eng.transform_batch if transforms else None,
        source_is_raw=True,
        prune_buckets=False,
    )
    tail = eng.replay(slicer, lsn_lo=resume_lsn, lsn_hi=lsn_hi)
    return BootstrapStats(bootstrap=info, tail=tail)
