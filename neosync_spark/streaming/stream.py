"""Structured Streaming front-end: tail the change log as a stream and
drive the SAME batch apply path via foreachBatch.

The reference is batch-with-resume (SURVEY.md §2.11) — its pagination
loop is our micro-batch loop. This module upgrades the engine to a
true streaming tail (`readStream` over the WAL directory; new parquet
files = new binlog segments) without duplicating any merge logic:
foreachBatch hands each micro-batch to ReplayEngine.apply_batch with
the batch's (min_lsn, max_lsn+1) as the ledger range, so a Spark
retry of an epoch (same file set ⇒ same range) is a no-op — the
exactly-once contract carries over to streaming unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import ReplayEngine
from ..schema import change_event_schema


class StreamingReplay:
    def __init__(
        self,
        engine: ReplayEngine,
        rollup_dst=None,
        consumers=None,
        event_consumers=None,
    ):
        """``consumers``: per-epoch CDC-consumer hooks (see
        ``streaming/consumers.py``) — after each committed epoch every
        consumer advances its derived table from its OWN ledger (work
        ∝ the epoch's diff; an epoch retry's re-sync is a no-op), so
        materialized rollups, secondary indexes and replicas tail the
        stream end-to-end with no full recompute anywhere.
        ``event_consumers``: hooks that need the epoch's EVENTS rather
        than a snapshot span (e.g. ``scd2_consumer`` — state diffs
        collapse intermediate versions); called with (batch, lsn_range)
        on every epoch INCLUDING retries (their own ledger no-ops an
        already-applied range). ``rollup_dst`` is the legacy
        single-rollup form of ``consumers``."""
        self.engine = engine
        self.consumers = list(consumers or [])
        self.event_consumers = list(event_consumers or [])
        if rollup_dst is not None:
            from .consumers import rollup_consumer

            self.consumers.append(rollup_consumer(rollup_dst))

    def _apply_epoch(self, batch: DataFrame, epoch_id: int) -> None:
        bounds = batch.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return
        rng = (int(bounds["lo"]), int(bounds["hi"]) + 1)
        if self.engine.table.is_applied(*rng):
            # epoch retry: the merge already committed, but a crash may
            # have landed between merge and consumer sync — catch up
            # (event consumers get the redelivered batch; their own
            # ledger makes an already-applied range a no-op)
            self._sync_events(batch, rng)
            self._sync_rollup()
            return
        if self.engine.registry is not None and self.engine.registry.versions:
            from ..schema_registry import ensure_table_schema

            declared = self.engine.registry.version_for_lsn(rng[1] - 1)
            ensure_table_schema(
                self.engine.table,
                declared.schema,
                self.engine.registry.policy,
                renames=getattr(declared, "rename_map", None),
            )
        self.engine.apply_batch(batch, rng)
        self._sync_events(batch, rng)
        self._sync_rollup()

    def _sync_events(self, batch: DataFrame, rng: tuple[int, int]) -> None:
        for consumer in self.event_consumers:
            consumer(batch, rng)

    def _sync_rollup(self) -> None:
        """Advance every consumer to the table's head, each FROM its
        own ledger — not the epoch's snapshot pair — so a crash between
        merge and sync (or a multi-epoch outage of a derived table)
        self-heals: the next sync diffs across everything missed."""
        if not self.consumers:
            return
        head = self.engine.table.manifest(refresh=True)["snapshot_id"]
        for consumer in self.consumers:
            consumer(self.engine.table, head)

    def start(
        self,
        log_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 8,
        with_tool: bool = True,
        follow: bool = False,
        processing_interval: str = "5 seconds",
    ):
        """Start the streaming query. Caller owns lifecycle
        (processAllAvailable()/stop() in tests, awaitTermination() in
        production). ``follow=False`` (default) drains what exists and
        stops (availableNow); ``follow=True`` keeps tailing new WAL
        files at ``processing_interval`` until stopped."""
        stream = (
            self.engine.spark.readStream.schema(change_event_schema(with_tool))
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(log_dir)
        )
        writer = stream.writeStream.foreachBatch(self._apply_epoch).option(
            "checkpointLocation", checkpoint_dir
        )
        if follow:
            writer = writer.trigger(processingTime=processing_interval)
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()
