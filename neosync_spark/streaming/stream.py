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
    def __init__(self, engine: ReplayEngine):
        self.engine = engine

    def _apply_epoch(self, batch: DataFrame, epoch_id: int) -> None:
        bounds = batch.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return
        rng = (int(bounds["lo"]), int(bounds["hi"]) + 1)
        if self.engine.table.is_applied(*rng):
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

    def start(
        self,
        log_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 8,
        with_tool: bool = True,
    ):
        """Start the streaming query. Caller owns lifecycle
        (processAllAvailable()/stop() in tests, awaitTermination() in
        production)."""
        stream = (
            self.engine.spark.readStream.schema(change_event_schema(with_tool))
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(log_dir)
        )
        return (
            stream.writeStream.foreachBatch(self._apply_epoch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
