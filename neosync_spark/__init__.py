"""neosync_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (not a port) with the data-processing capabilities of
nucleuscloud/neosync's sync-and-anonymize pipeline, re-conceived as a
binlog/WAL change-event tail feeding idempotent MERGE upserts into a
snapshot-versioned lakehouse table of multi-turn transcripts, with the
reference's per-column anonymization transformers expressed as seeded,
vectorized pandas/Arrow UDFs.

Reference semantics studied at /root/reference (neosync @ 2025-07-11);
file:line citations in docstrings point there. All code here is original
and Spark-first.
"""

__version__ = "0.1.0"
