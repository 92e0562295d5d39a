"""Incremental BM25 text index — full-text search as a CDC consumer.

``text.bm25_topk`` tokenizes the corpus per query; at 10^10 documents
the index must be *maintained*, not rebuilt. This module persists the
inverted index in two SnapshotTables:

- ``postings`` keyed ``(term, doc_id)`` — and since the lakehouse
  buckets by the LEADING key column, the postings are physically
  sharded BY TERM: a query's ``read(key_equals={"term": terms})``
  prunes to the |terms| hash buckets (plus per-file term blooms), so
  the scan touches posting lists, never the corpus — the inverted-
  index access path expressed entirely with the table format's own
  pruning machinery;
- ``docstats`` keyed ``doc_id`` — (doc_id, dl) rows; N and avgdl are
  one tiny aggregate over it.

An epoch's maintenance is O(new docs): tokenize ONLY the new
documents, merge both tables through the exactly-once ledger (a
crash-replayed epoch no-ops both). Like the MinHash dedup index, the
corpus is treated as append-only — the norm for a training-data lake,
where re-writing a document means minting a new doc_id; re-indexing a
MUTATED doc_id would leave its removed terms' postings stale (delete
the old doc's postings first if you must).

Scoring is byte-identical to ``text.bm25_topk`` (same smoothed idf,
same integer-exact avgdl, same rounding and tie-break), so the two
paths verify each other and share the DuckDB oracle.

No reference counterpart (Neosync has no search); public Okapi BM25.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import SnapshotTable
from ..util import round_half_up
from .text import _tokens

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.DoubleType()),
        T.StructField("dl", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
DOCSTATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dl", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


class TextIndex:
    def __init__(self, postings: SnapshotTable, docstats: SnapshotTable):
        self.postings = postings
        self.docstats = docstats


def create_text_index(
    spark: SparkSession, path: str, n_buckets: int = 64
) -> TextIndex:
    """Two-table inverted index under ``path`` (postings bucketed by
    term — the posting-list shards; per-file term blooms for the
    within-bucket prune)."""
    return TextIndex(
        SnapshotTable.create(
            spark,
            os.path.join(path, "postings"),
            POSTINGS_SCHEMA,
            key_cols=["term", "doc_id"],
            order_cols=["ts"],
            n_buckets=n_buckets,
            bloom_cols=["term"],
        ),
        SnapshotTable.create(
            spark,
            os.path.join(path, "docstats"),
            DOCSTATS_SCHEMA,
            key_cols=["doc_id"],
            order_cols=["ts"],
            n_buckets=max(4, n_buckets // 4),
        ),
    )


def load_text_index(spark: SparkSession, path: str) -> TextIndex:
    return TextIndex(
        SnapshotTable.load(spark, os.path.join(path, "postings")),
        SnapshotTable.load(spark, os.path.join(path, "docstats")),
    )


def text_index_sync(
    idx: TextIndex,
    new_docs: DataFrame,
    content_col: str,
    id_col: str,
    applied_range: tuple[int, int] | None = None,
) -> dict:
    """One incremental epoch: tokenize ONLY the new documents and merge
    their postings + doc stats through the ledger. Replay = no-op on
    both tables. Returns row counts written."""
    epoch = max(idx.postings.sync_ordinal(), idx.docstats.sync_ordinal()) - 1
    par = new_docs.sparkSession.sparkContext.defaultParallelism
    base = new_docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).cast("long").alias("doc_id"),
        _tokens(F.lower(F.col(content_col))).alias("_tk"),
    )
    ts = F.timestamp_seconds(F.lit(epoch + 1))
    postings = (
        base.select(
            "doc_id",
            F.size("_tk").cast("double").alias("dl"),
            F.explode("_tk").alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.first("dl").alias("dl"),
        )
        .select(
            "term", "doc_id", "tf", "dl",
            F.lit("insert").alias("op"),
            F.col("doc_id").alias("lsn"),
            ts.alias("ts"),
        )
    )
    stats = base.select(
        "doc_id",
        F.size("_tk").cast("double").alias("dl"),
        F.lit("insert").alias("op"),
        F.col("doc_id").alias("lsn"),
        ts.alias("ts"),
    )
    # an epoch's terms hash across most buckets: the bucket pre-pass
    # would only add a full extra scan of the batch
    i1 = idx.postings.merge_cdc(
        postings, applied_range=applied_range, mode="cow",
        source_is_raw=False, lineage=False, prune_buckets=False,
    )
    i2 = idx.docstats.merge_cdc(
        stats, applied_range=applied_range, mode="cow",
        source_is_raw=False, lineage=False, prune_buckets=False,
    )
    return {"postings_written": i1.rows_written, "docs_written": i2.rows_written}


def text_index_topk(
    idx: TextIndex,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k over the maintained index. The postings read is
    bucket-pruned to the query terms' hash buckets and bloom-pruned
    within them (``read(key_equals=...)``) — at most |terms| posting
    lists reach the score; the corpus text is never touched. Identical
    arithmetic/rounding/tie-break to ``text.bm25_topk``."""
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    hits = idx.postings.read(key_equals={"term": terms}).select(
        F.col("doc_id").alias("_id"),
        F.col("term").alias("_t"),
        F.col("tf").alias("_tf"),
        F.col("dl").alias("_dl"),
    )
    stats = idx.docstats.read().agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        (
            F.sum(F.col("dl").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_avgdl"),
    )
    dfreq = hits.groupBy("_t").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "_t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (
                F.col("_tf")
                + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.sum("_s").alias("_score"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    return (
        per_doc.orderBy(F.col("_score").desc(), F.col("_id"))
        .limit(k)
        .select(
            F.col("_id").alias("doc_id"),
            round_half_up(F.col("_score"), 4).alias("bm25"),
            "n_terms_hit",
        )
    )
