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
        self._fmt = "parquet"
        self._payload_schema = None
        self._evolve_payload = False
        self._strict_types = False
        self._toast_placeholder = None
        self.consumers = list(consumers or [])
        self.event_consumers = list(event_consumers or [])
        if rollup_dst is not None:
            from .consumers import rollup_consumer

            self.consumers.append(rollup_consumer(rollup_dst))

    def _apply_epoch(self, batch: DataFrame, epoch_id: int) -> None:
        rng = None
        if self._fmt == "debezium":
            from ..sources.debezium import decode_debezium

            # The wire format cannot promise unique scalar positions:
            # a snapshot ('r') hop stamps ONE source.lsn on every row,
            # so two micro-batches of the same hop would share min/max
            # bounds and the exact-match ledger would falsely skip the
            # second. Epoch identity must come from the epoch itself:
            # fingerprint the micro-batch's input FILE SET (a Spark
            # retry redelivers the same files => same range => no-op;
            # distinct epochs read distinct files => distinct ranges).
            # The high bit keeps these ids out of real WAL lsn space,
            # so they can never fall inside a compacted ledger span.
            rng = self._file_set_range(batch)
            if rng is None:
                return
            if self._evolve_payload and not (
                self.engine.registry is not None
                and self.engine.registry.versions
            ):
                # wire-schema drift: a producer that added a column
                # mid-feed keeps parsing cleanly while from_json drops
                # the new field — detect it (one narrow key-agg over
                # the epoch), evolve the DESTINATION through the same
                # additive path a registry version would take, then
                # decode with the widened schema so this very epoch's
                # rows keep the column. A configured schema registry
                # stays authoritative (its declared schema would treat
                # wire-added columns as drift to undo), so evolution
                # is skipped when versions exist.
                from ..schema_registry import ensure_table_schema
                from ..sources.debezium import infer_payload_evolution

                widened, new_fields = infer_payload_evolution(
                    batch, self._payload_schema
                )
                if widened is not None:
                    from pyspark.sql import types as T  # noqa: N812

                    declared = T.StructType(
                        list(self.engine.table.current_schema().fields)
                        + new_fields
                    )
                    ensure_table_schema(self.engine.table, declared)
                    self._payload_schema = widened
            batch, rescue = decode_debezium(
                batch, self._payload_schema,
                strict_types=self._strict_types,
                toast_placeholder=self._toast_placeholder,
            )
            if self.engine.config.quarantine:
                import os

                rs = rescue.withColumn(
                    "_epoch_id", F.lit(int(epoch_id))
                ).persist()
                if rs.count():
                    rs.write.mode("append").parquet(
                        os.path.join(
                            self.engine.table.path,
                            "metadata",
                            "quarantine_envelope",
                        )
                    )
                rs.unpersist()
        if rng is None:
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

    @staticmethod
    def _file_set_range(batch: DataFrame) -> tuple[int, int] | None:
        """Deterministic 1-wide ledger range from the micro-batch's
        distinct input files. Listing the file names is a metadata
        aggregation (one row per file survives the partial agg), not a
        data collect."""
        import hashlib

        rows = batch.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
        paths = sorted(r["f"] for r in rows)
        if not paths:
            return None
        from ..lakehouse import SYNTHETIC_LSN_BASE

        digest = hashlib.sha256("\n".join(paths).encode()).digest()
        h = int.from_bytes(digest[:8], "big") & (SYNTHETIC_LSN_BASE - 1)
        lo = SYNTHETIC_LSN_BASE | h
        return (lo, lo + 1)

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
        fmt: str = "parquet",
        payload_schema=None,
        evolve_payload: bool = False,
        strict_types: bool = False,
        toast_placeholder: str | None = None,
    ):
        """Start the streaming query. Caller owns lifecycle
        (processAllAvailable()/stop() in tests, awaitTermination() in
        production). ``follow=False`` (default) drains what exists and
        stops (availableNow); ``follow=True`` keeps tailing new WAL
        files at ``processing_interval`` until stopped.

        ``fmt="debezium"`` tails envelope JSONL files (the wire format
        ``export-cdc`` emits and real Debezium connectors produce)
        instead of raw parquet WAL segments: each micro-batch is
        JVM-decoded via ``decode_debezium`` and fed to the same merge/
        ledger path; malformed envelopes are quarantined per epoch to
        ``<table>/metadata/quarantine_envelope`` when the engine's
        quarantine flag is on. ``payload_schema`` is the envelope's row
        schema (default: the transcript payload).

        ``evolve_payload=True`` (debezium only) watches the wire for
        payload fields the schema lacks — a producer adding a column
        mid-feed otherwise keeps parsing cleanly while ``from_json``
        silently drops the new field. Each epoch runs one narrow
        key-set aggregation over the envelope images; on drift the
        destination table gains the columns (additive, through
        ``ensure_table_schema``) BEFORE the epoch decodes, so the first
        epoch carrying a column also lands it. New columns type from
        one sampled image (long/double/boolean/string; nested JSON
        stays a raw-JSON string column). Ignored when a schema
        registry is configured — declared versions stay authoritative.

        ``strict_types=True`` (debezium only) rescues rows whose wire
        token doesn't fit a declared field type instead of letting
        PERMISSIVE from_json null the field silently (see
        ``decode_debezium``); with quarantine on they land in
        quarantine_envelope with reason ``type_conflict:<fields>``.

        ``toast_placeholder`` (debezium only): treat the given literal
        in an update's string columns as Postgres' unchanged-TOAST
        sentinel — resolved from the pre-image when present, else the
        event demotes to a partial-image patch (see
        ``decode_debezium``). Requires the engine to run with
        ``patch_ops=True`` so unresolved columns fold as "keep".
        """
        self._fmt = fmt
        self._evolve_payload = bool(evolve_payload)
        self._strict_types = bool(strict_types)
        self._toast_placeholder = toast_placeholder
        if toast_placeholder is not None and not self.engine.config.patch_ops:
            raise ValueError(
                "toast_placeholder demotes unresolved updates to patch "
                "events — run the engine with EngineConfig(patch_ops=True)"
            )
        if fmt == "debezium":
            if payload_schema is None:
                from pyspark.sql import types as T

                from ..schema import transcript_schema

                payload_schema = T.StructType(
                    [f for f in transcript_schema().fields if f.name != "ts"]
                )
            self._payload_schema = payload_schema
            stream = (
                self.engine.spark.readStream.option(
                    "maxFilesPerTrigger", str(max_files_per_trigger)
                ).text(log_dir)
            )
        elif fmt == "parquet":
            stream = (
                self.engine.spark.readStream.schema(
                    change_event_schema(with_tool)
                )
                .option("maxFilesPerTrigger", str(max_files_per_trigger))
                .parquet(log_dir)
            )
        else:
            raise ValueError(f"unknown stream format {fmt!r}")
        writer = stream.writeStream.foreachBatch(self._apply_epoch).option(
            "checkpointLocation", checkpoint_dir
        )
        if follow:
            writer = writer.trigger(processingTime=processing_interval)
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()
