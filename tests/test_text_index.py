"""Incremental BM25 inverted index (operators/text_index): postings
bucketed by term, ledgered epochs, query == one-shot bm25_topk."""

from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.operators.text import bm25_topk
from neosync_spark.operators.text_index import (
    create_text_index,
    load_text_index,
    text_index_sync,
    text_index_topk,
)

DOCS = [
    (0, "merge window checkpoint merge"),
    (1, "window function over partition"),
    (2, "checkpoint resume ledger checkpoint checkpoint"),
    (3, "completely unrelated words here"),
    (4, "merge merge merge conflict resolution window"),
    (5, "the quick brown fox"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_equals_one_shot(spark, tmp_path):
    docs = _docs(spark)
    idx = create_text_index(spark, str(tmp_path / "idx"), n_buckets=8)
    text_index_sync(idx, docs.filter(F.col("doc_id") < 3), "text", "doc_id",
                    applied_range=(0, 3))
    text_index_sync(idx, docs.filter(F.col("doc_id") >= 3), "text", "doc_id",
                    applied_range=(3, 6))
    terms = ["merge", "checkpoint", "window"]
    got = [tuple(r) for r in text_index_topk(idx, terms, k=5).collect()]
    want = [tuple(r) for r in bm25_topk(docs, "text", "doc_id", terms, k=5).collect()]
    assert got == want and len(got) == 4  # docs 3 and 5 match no term


def test_replay_noop_and_reload(spark, tmp_path):
    docs = _docs(spark)
    idx = create_text_index(spark, str(tmp_path / "idx"), n_buckets=4)
    r1 = text_index_sync(idx, docs, "text", "doc_id", applied_range=(0, 6))
    assert r1["postings_written"] > 0 and r1["docs_written"] == 6
    r2 = text_index_sync(idx, docs, "text", "doc_id", applied_range=(0, 6))
    assert r2 == {"postings_written": 0, "docs_written": 0}
    idx2 = load_text_index(spark, str(tmp_path / "idx"))
    got = text_index_topk(idx2, ["merge"], k=2).collect()
    assert got[0]["doc_id"] == 4  # three 'merge's in a short doc


def test_query_reads_only_term_buckets(spark, tmp_path):
    """The posting read prunes to the query terms' hash buckets (+
    blooms): far fewer files opened than the index holds."""
    docs = _docs(spark)
    idx = create_text_index(spark, str(tmp_path / "idx"), n_buckets=16)
    text_index_sync(idx, docs, "text", "doc_id", applied_range=(0, 6))
    full = idx.postings.scan_stats()
    pruned = idx.postings.scan_stats(key_equals={"term": ["merge"]})
    assert pruned["files_kept"] < full["files_kept"]
    # and the pruned read is exactly the term's postings
    rows = idx.postings.read(key_equals={"term": ["merge"]}).collect()
    assert {r["doc_id"] for r in rows} == {0, 4}
    assert {r["term"] for r in rows} == {"merge"}


def test_empty_terms_raises(spark, tmp_path):
    import pytest

    idx = create_text_index(spark, str(tmp_path / "idx"), n_buckets=4)
    with pytest.raises(ValueError):
        text_index_topk(idx, [])
