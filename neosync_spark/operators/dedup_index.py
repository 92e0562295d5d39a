"""Incremental MinHash-LSH dedup index — near-duplicate detection as a
CDC consumer.

At 10^10 documents you cannot re-shingle the corpus every time a batch
of new documents lands. This module persists the LSH *band index* —
one (doc_id, band, band_hash) row per document per band — in a
SnapshotTable, so an epoch's work is O(new docs):

1. shingle + minhash + band ONLY the new docs (the same codegen'd
   2-hash affine pipeline as `similarity.minhash_dedup_pairs`);
2. collide the new band rows against the persisted index (cross-epoch
   pairs) and against themselves (within-epoch pairs) — the join input
   is |new bands| × matches, never corpus-sized on the probe side;
3. verify candidates by exact n-gram Jaccard, shingling ONLY the
   candidate docs (a semi-join prune against the lake — old docs'
   text is fetched per candidate, not per epoch);
4. merge the new band rows into the index through the ledgered
   `merge_cdc` — an epoch replay after a crash is a table no-op, and
   the emitted pair set is a deterministic function of (index state,
   new docs), so re-emission is idempotent too.

Invariant (oracled in the gate): the union of per-epoch pair sets over
any epoch partitioning of the corpus equals the single-shot
`minhash_dedup_pairs` over the full corpus — incremental maintenance
never loses or invents a duplicate pair.

No reference counterpart (Neosync has no dedup); the pattern follows
the public BigQuery/Spark LSH-at-scale literature (SURVEY §6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import CommitInfo, SnapshotTable
from ..util import literal_frame
from .similarity import (
    minhash_band_buckets,
    ngram_jaccard,
    round_half_up,
    shingle_docs,
)

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def create_minhash_index(
    spark: SparkSession, path: str, n_buckets: int = 64
) -> SnapshotTable:
    """An empty band-index table keyed by (doc_id, band)."""
    return SnapshotTable.create(
        spark,
        path,
        INDEX_SCHEMA,
        key_cols=["doc_id", "band"],
        order_cols=["ts"],
        n_buckets=n_buckets,
    )


def minhash_index_sync(
    index: SnapshotTable,
    new_docs: DataFrame,
    corpus: DataFrame,
    content_col: str,
    id_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    applied_range: tuple[int, int] | None = None,
) -> DataFrame:
    """One incremental epoch: index the new docs, return the verified
    near-duplicate pairs they introduce — ``(id_a, id_b, jaccard)``
    with id_a < id_b, covering new×indexed and new×new.

    ``corpus`` is the document lake (must contain at least the indexed
    + new docs' text); it is touched only through a candidate-id
    semi-join. ``applied_range`` is the epoch's ledger key: a replayed
    epoch leaves the index unchanged and re-emits the same pairs.

    Cost model: each epoch runs a fixed number of Spark actions (band
    pre-pass, index merge commit, verification materialize) on top of
    the O(new docs) data work — per-epoch overhead of a few seconds
    that amortizes at design scale (10^6+ new docs/epoch) but dominates
    toy epochs; batch tiny arrivals before syncing.
    """
    shingled_new = shingle_docs(new_docs, content_col, id_col, shingle_n)
    banded_new = minhash_band_buckets(
        shingled_new, "_sh", "_id", num_hashes, bands, seed
    ).persist()

    existing = index.read().select(
        F.col("doc_id").alias("_id"), "band", "band_hash"
    )
    # a replayed epoch finds its own rows already indexed; dropping
    # them here keeps cross-epoch candidates disjoint from new×new
    existing = existing.join(
        banded_new.select("_id").distinct(), "_id", "left_anti"
    )

    cross = (
        banded_new.alias("n")
        .join(
            existing.alias("o"),
            on=[
                F.col("n.band") == F.col("o.band"),
                F.col("n.band_hash") == F.col("o.band_hash"),
            ],
        )
        .select(
            F.least(F.col("n._id"), F.col("o._id")).alias("id_a"),
            F.greatest(F.col("n._id"), F.col("o._id")).alias("id_b"),
        )
    )
    within = (
        banded_new.alias("l")
        .join(
            banded_new.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
    )
    cands = cross.unionByName(within).distinct().persist()

    # shingle ONLY candidate docs (old docs re-shingled per candidate,
    # not per epoch — the index holds hashes, the lake holds text)
    cand_ids = (
        cands.select(F.col("id_a").alias("_cid"))
        .unionByName(cands.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    cand_docs = corpus.join(
        cand_ids, corpus[id_col] == F.col("_cid"), "left_semi"
    )
    sh = shingle_docs(cand_docs, content_col, id_col, shingle_n).persist()

    verified = (
        cands.join(
            sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa")),
            "id_a",
        )
        .join(
            sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb")),
            "id_b",
        )
        .withColumn(
            "jaccard", round_half_up(ngram_jaccard(F.col("_sa"), F.col("_sb")), 4)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

    # band rows join the index through the ledgered merge. LWW order
    # must be MONOTONIC across epochs so a re-synced doc's fresh band
    # rows beat stale ones — but content-keyed epoch values are random
    # 62-bit ints, so (lo, lo) would let an earlier epoch with a larger
    # value win forever. Order by the index's own sync ordinal:
    # strictly increasing per applied epoch, crash-replay-safe (an
    # unapplied epoch recomputes the same ordinal; an applied one never
    # reaches the merge, and merge_cdc breaks ties source-wins), and
    # immune to ledger compaction (not a ledger-row count).
    lo = applied_range[0] if applied_range is not None else 0
    ordinal = index.sync_ordinal()
    batch = banded_new.select(
        F.lit("insert").alias("op"),
        F.col("_id").alias("doc_id"),
        "band",
        "band_hash",
        F.timestamp_seconds(F.lit(ordinal)).alias("ts"),
        F.lit(int(lo)).alias("lsn"),
    )
    index.merge_cdc(batch, applied_range=applied_range, lineage=False)
    # epochs run for the lifetime of the tailing driver: materialize
    # the (small) pair set, then release the per-epoch caches — only
    # `verified` stays pinned, and the caller owns its lifetime
    verified = verified.persist()
    verified.count()
    for df_ in (banded_new, cands, sh):
        df_.unpersist()
    return verified


# ---------------------------------------------------------------------------
# Conversation-granularity index: near-dup signatures maintained by the
# CDC tail itself
# ---------------------------------------------------------------------------

CONV_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def create_conv_index(
    spark: SparkSession, path: str, n_buckets: int = 64
) -> SnapshotTable:
    """An empty conversation band-index keyed ``(conv_id, band)``."""
    return SnapshotTable.create(
        spark,
        path,
        CONV_INDEX_SCHEMA,
        key_cols=["conv_id", "band"],
        order_cols=["ts"],
        n_buckets=n_buckets,
    )


def conv_index_sync(
    src: SnapshotTable,
    index: SnapshotTable,
    to_snapshot: int,
    from_snapshot: int | None = None,
    text_col: str = "text",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> "CommitInfo":
    """Advance the conversation near-dup index to describe ``src`` at
    ``to_snapshot`` — dedup signatures maintained BY the CDC tail, at
    conversation granularity (the granularity a training pipeline
    packs), at O(changed conversations) per epoch.

    Mechanics per epoch:

    - changed conversations come from ``snapshot_diff`` (a bucket-
      pruned manifest comparison — an epoch touching 0.1% of convs
      reads 0.1% of buckets, incl. every turn-level insert/update/
      delete and whole-conv deletes);
    - their CURRENT docs are re-assembled from the pruned read
      (``conversation_docs``: turn-order concat, one conv shuffle over
      changed buckets only) and re-signed — a conv's ``bands`` rows are
      keyed ``(conv_id, band)``, so an update atomically replaces ALL
      of its band hashes and no stale signature can survive;
    - conversations with no surviving live turn emit DELETE for every
      band key (full retraction);
    - the merge is ledgered by ``(from, to)`` snapshot span with the
      same sync-ordinal LWW ordering as ``minhash_index_sync`` — a
      replayed/crashed epoch is a no-op, and a consumer outage heals by
      diffing across everything missed.

    Invariant (oracled in the gate): after any epoch partitioning of
    the log, the index equals the single-shot banding of the FINAL
    conversation states — serving near-dup pairs without ever
    re-minhashing the corpus (``conv_index_pairs``).
    """
    from .conversations import conversation_docs
    from .stats_sync import changed_buckets

    applied_range = (from_snapshot or 0, to_snapshot)
    if from_snapshot == to_snapshot or index.is_applied(*applied_range):
        return CommitInfo(
            index.manifest(refresh=True)["snapshot_id"], 0, 0, applied_range
        )

    if from_snapshot is None:
        state = src.read(snapshot_id=to_snapshot)
        changed = None
    else:
        bs = changed_buckets(src, from_snapshot, to_snapshot)
        changed = (
            src.snapshot_diff(from_snapshot, to_snapshot)
            .select(F.col(conv_col).alias("_cc"))
            .distinct()
            .persist()
        )
        state = src.read(snapshot_id=to_snapshot, buckets=bs).join(
            F.broadcast(changed),
            F.col(conv_col) == F.col("_cc"),
            "left_semi",
        )

    docs = conversation_docs(state, conv_col, turn_col, text_col)
    shingled = shingle_docs(docs, "doc", conv_col, shingle_n)
    banded = minhash_band_buckets(
        shingled, "_sh", "_id", num_hashes, bands, seed
    )

    ordinal = index.sync_ordinal()
    lo = int(applied_range[0])
    upserts = banded.select(
        F.lit("insert").alias("op"),
        F.col("_id").alias("conv_id"),
        "band",
        "band_hash",
        F.timestamp_seconds(F.lit(ordinal)).alias("ts"),
        F.lit(lo).alias("lsn"),
    )
    batch = upserts
    if changed is not None:
        # changed convs with no surviving live turn: retract every band
        gone = changed.join(
            docs.select(F.col(conv_col).alias("_cc")), "_cc", "left_anti"
        )
        bands_df = literal_frame(
            index.spark,
            [(int(b),) for b in range(bands)],
            T.StructType([T.StructField("band", T.IntegerType(), False)]),
        )
        deletes = gone.crossJoin(bands_df).select(
            F.lit("delete").alias("op"),
            F.col("_cc").alias("conv_id"),
            "band",
            F.lit(None).cast("long").alias("band_hash"),
            F.timestamp_seconds(F.lit(ordinal)).alias("ts"),
            F.lit(lo).alias("lsn"),
        )
        batch = upserts.unionByName(deletes)
    info = index.merge_cdc(batch, applied_range=applied_range, lineage=False)
    if changed is not None:
        changed.unpersist()
    return info


def conv_index_pairs(
    index: SnapshotTable,
    src: SnapshotTable,
    text_col: str = "text",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Serve verified conversation near-dup pairs FROM the index:
    collide band rows on (band, band_hash) — a self-join of the
    (small) signature table, never the corpus — then exact-Jaccard
    verify only the candidate conversations' docs, fetched through a
    semi-join against the lake. Returns ``(id_a, id_b, jaccard)``,
    id_a < id_b."""
    from .conversations import conversation_docs

    rows = index.read().select(
        F.col("conv_id").alias("_id"), "band", "band_hash"
    )
    cands = (
        rows.alias("l")
        .join(
            rows.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("_cid"))
        .unionByName(cands.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    cand_docs = conversation_docs(
        src.read().join(
            cand_ids, F.col(conv_col) == F.col("_cid"), "left_semi"
        ),
        conv_col,
        turn_col,
        text_col,
    )
    sh = shingle_docs(cand_docs, "doc", conv_col, shingle_n)
    return (
        cands.join(
            sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa")),
            "id_a",
        )
        .join(
            sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            round_half_up(ngram_jaccard(F.col("_sa"), F.col("_sb")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
