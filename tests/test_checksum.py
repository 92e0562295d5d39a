"""Replica checksums: order-independence, divergence localization,
NULL canonicalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.operators.checksum import (
    chunk_checksums,
    diverged_chunks,
    table_checksum,
)


def _src(spark):
    return spark.createDataFrame(
        [(i, f"v{i}", None if i % 3 else "x") for i in range(100)],
        "id long, a string, b string",
    )


def test_digest_order_and_partition_independent(spark):
    src = _src(spark)
    a = table_checksum(src).collect()[0]
    b = table_checksum(src.repartition(13).orderBy(F.rand(5))).collect()[0]
    assert (a["n_rows"], a["digest_xor"], str(a["digest_sum"])) == (
        b["n_rows"], b["digest_xor"], str(b["digest_sum"]))
    assert diverged_chunks(src, src.repartition(7), "id").count() == 0


def test_single_mutation_localizes_to_one_chunk(spark):
    src = _src(spark)
    dst = src.withColumn(
        "a", F.when(F.col("id") == 42, "MUTATED").otherwise(F.col("a"))
    )
    div = diverged_chunks(src, dst, "id", n_chunks=16).collect()
    assert len(div) == 1
    assert div[0]["rows_match"] and not div[0]["digest_match"]


def test_deleted_row_breaks_row_count(spark):
    src = _src(spark)
    div = diverged_chunks(src, src.filter("id <> 7"), "id", n_chunks=16).collect()
    assert len(div) == 1
    assert div[0]["src_rows"] == div[0]["dst_rows"] + 1


def test_null_vs_empty_string_distinct(spark):
    x = spark.createDataFrame([(1, None)], "id long, a string")
    y = spark.createDataFrame([(1, "")], "id long, a string")
    dx = x.select(*[F.col(c) for c in x.columns])
    assert (
        table_checksum(dx).collect()[0]["digest_xor"]
        != table_checksum(y).collect()[0]["digest_xor"]
    )


def test_empty_table_digest(spark):
    e = spark.createDataFrame([], "id long, a string")
    row = table_checksum(e).collect()[0]
    assert row["n_rows"] == 0 and row["digest_xor"] == 0
