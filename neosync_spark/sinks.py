"""Auxiliary sinks: run archives + multi-destination fan-out.

* ``archive_jsonl`` — the aws_s3/gcs output analog: batches written as
  ``workflows/<run_id>/activities/<table>/records-*.jsonl.gz``
  (/root/reference/internal/benthos/benthos-builder/builders/
  aws-s3.go:50-92 path layout). Archives are replayable inputs (the
  neosync_connection_data replay source analog).
* ``fan_out`` — the broker fan_out output analog (config.go:188-198):
  one batch written to N destinations sequentially; any failure aborts
  before the ledger advances, so the batch retries into all sinks
  (each destination must be idempotent, as ours are).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def archive_jsonl(df: DataFrame, root: str, run_id: str, table: str) -> str:
    path = f"{root}/workflows/{run_id}/activities/{table}"
    df.write.mode("append").option("compression", "gzip").json(path)
    return path


def read_archive(spark, root: str, run_id: str, table: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(f"{root}/workflows/{run_id}/activities/{table}")


def fan_out(df: DataFrame, sinks: list[Callable[[DataFrame], None]]) -> None:
    """Write one batch to every sink. The frame is persisted across
    sinks so the (possibly expensive) upstream computes once."""
    df = df.persist()
    try:
        for sink in sinks:
            sink(df)
    finally:
        df.unpersist()
