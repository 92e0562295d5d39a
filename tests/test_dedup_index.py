"""Incremental MinHash-LSH dedup index: cross-epoch pair detection,
incremental == single-shot, ledgered replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.operators.dedup_index import (
    create_minhash_index,
    minhash_index_sync,
)
from neosync_spark.operators.similarity import minhash_dedup_pairs


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    rows = [
        (1, base),
        (2, base + " tonight"),  # near-dup of 1 (same epoch)
        (3, "completely different text about cooking pasta with garlic "
            "butter and fresh basil leaves simmered in olive oil sauce"),
        (10, base + " quietly"),  # near-dup of 1/2, LATER epoch
        (11, "unrelated musings on the architecture of distributed "
             "database systems and their consistency guarantees today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_epoch_pairs_and_equivalence(spark, tmp_path):
    docs = _docs(spark)
    idx = create_minhash_index(spark, str(tmp_path / "idx"), n_buckets=4)
    e1 = docs.filter(F.col("doc_id") < 10)
    e2 = docs.filter(F.col("doc_id") >= 10)

    p1 = minhash_index_sync(
        idx, e1, docs, "text", "doc_id", threshold=0.5, applied_range=(0, 1)
    ).collect()
    pairs1 = {(r["id_a"], r["id_b"]) for r in p1}
    assert pairs1 == {(1, 2)}  # within-epoch-1 dup found immediately

    p2 = minhash_index_sync(
        idx, e2, docs, "text", "doc_id", threshold=0.5, applied_range=(1, 2)
    ).collect()
    pairs2 = {(r["id_a"], r["id_b"]) for r in p2}
    # doc 10 collides with BOTH indexed near-dups — found via the
    # persisted index without re-shingling epoch 1
    assert pairs2 == {(1, 10), (2, 10)}

    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(
            docs, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert pairs1 | pairs2 == full


def test_replay_is_noop_and_reemits(spark, tmp_path):
    docs = _docs(spark)
    idx = create_minhash_index(spark, str(tmp_path / "idx"), n_buckets=4)
    e1 = docs.filter(F.col("doc_id") < 10)
    minhash_index_sync(
        idx, e1, docs, "text", "doc_id", threshold=0.5, applied_range=(0, 1)
    ).collect()
    snap_before = idx.manifest(refresh=True)["snapshot_id"]
    rows_before = idx.read().count()

    replayed = minhash_index_sync(
        idx, e1, docs, "text", "doc_id", threshold=0.5, applied_range=(0, 1)
    ).collect()
    assert idx.manifest(refresh=True)["snapshot_id"] == snap_before
    assert idx.read().count() == rows_before
    assert {(r["id_a"], r["id_b"]) for r in replayed} == {(1, 2)}


def test_threshold_filters_weak_candidates(spark, tmp_path):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, a), (2, a + " lambda mu nu xi omicron pi rho sigma tau")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = create_minhash_index(spark, str(tmp_path / "idx"), n_buckets=2)
    strict = minhash_index_sync(
        idx, docs, docs, "text", "doc_id", threshold=0.9, applied_range=(0, 1)
    ).collect()
    assert strict == []  # candidate collides but fails the 0.9 verify


def test_resync_updated_doc_wins_under_nonmonotonic_epochs(spark, tmp_path):
    """Content-keyed epochs are random ints: a re-synced doc's fresh
    band rows must beat the stale ones even when the second epoch's
    ledger value is NUMERICALLY SMALLER than the first (LWW orders by
    the index's applied-epoch ordinal, not the epoch value)."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    v1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    edited = (
        "an entirely rewritten document describing slow cooked stews "
        "with root vegetables thyme bay leaves and a splash of red wine"
    )
    v2 = spark.createDataFrame([(1, edited)], "doc_id long, text string")

    idx = create_minhash_index(spark, str(tmp_path / "idx"), n_buckets=2)
    # first epoch under a LARGE content-keyed value
    minhash_index_sync(
        idx, v1, v1, "text", "doc_id", threshold=0.5,
        applied_range=(9_000_000_000, 9_000_000_001),
    ).collect()
    hashes_v1 = {
        (r["band"], r["band_hash"]) for r in idx.read().collect()
    }
    # re-sync the edited doc under a SMALLER epoch value
    minhash_index_sync(
        idx, v2, v2, "text", "doc_id", threshold=0.5,
        applied_range=(17, 18),
    ).collect()
    hashes_v2 = {
        (r["band"], r["band_hash"]) for r in idx.read().collect()
    }
    assert hashes_v2 != hashes_v1  # stale signature was replaced

    # and the index now matches a fresh index built from the edit alone
    idx2 = create_minhash_index(spark, str(tmp_path / "idx2"), n_buckets=2)
    minhash_index_sync(
        idx2, v2, v2, "text", "doc_id", threshold=0.5, applied_range=(0, 1)
    ).collect()
    fresh = {(r["band"], r["band_hash"]) for r in idx2.read().collect()}
    assert hashes_v2 == fresh
