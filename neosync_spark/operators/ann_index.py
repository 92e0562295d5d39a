"""Incremental IVF ANN index — similarity search as a CDC consumer.

At 10^10 embeddings you cannot re-run k-means and re-assign the corpus
per query (what a one-shot ``similarity.ivf_topk`` call does). This
module persists the IVF index — one ``(cell, vec_id, vec)`` row per
vector — in a SnapshotTable with frozen centroids. Because ``cell`` is
the LEADING key column, the lakehouse physically shards the index BY
CELL (exactly how ``text_index`` shards postings by term), so:

- an epoch's maintenance work is O(new vectors): assign ONLY the new
  embeddings to their nearest frozen centroid (one vectorized matmul
  per Arrow batch) and merge through the ledgered ``merge_cdc`` — a
  crash-replayed epoch is a table no-op;
- a query touches ONLY the ``n_probe`` probed cells' hash buckets:
  probe cells are picked driver-side from the k×dim centroid matrix,
  ``read(key_equals={"cell": probe})`` prunes the scan to their
  buckets, and exact cosine re-ranks the surviving vectors from the
  index's own payload — the corpus table is never opened at query
  time (the inverted-list access path of FAISS-style IVF, expressed
  with the table format's own bucket pruning).

Centroids are FROZEN at index creation (stored as JSON next to the
table metadata): assignments stay consistent across epochs by
construction. Distribution drift degrades recall, not correctness —
monitor with ``monitor.column_drift`` on the cell histogram and
rebuild when it drifts (the standard IVF operations story, e.g. FAISS:
train once, add forever, retrain on drift).

No reference counterpart (Neosync has no vector search); follows the
public IVF literature (Jégou et al. 2011) like similarity.py's
one-shot variants.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import SnapshotTable
from .similarity import cosine_topk, ivf_centroids, ivf_centroids_distributed

_CENTROID_FILE = "centroids.json"


def _index_schema(vec_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("vec", vec_type),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def create_ivf_index(
    spark: SparkSession,
    path: str,
    train_df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 16,
    seed: int = 42,
    n_buckets: int = 16,
    iters: int = 8,
    train: str = "distributed",
    sample_size: int = 4096,
) -> SnapshotTable:
    """Train centroids on ``train_df`` and create the empty index
    table, keyed ``(cell, vec_id)`` so the rows are physically bucketed
    by cell, with the centroids frozen beside its metadata. The vector
    payload column keeps ``train_df``'s exact element type, so
    index-served scores are bit-identical to corpus-served ones.

    ``train="distributed"`` runs Spark-side Lloyd's (only k×dim stats
    reach the driver — full-corpus training at any scale);
    ``train="sample"`` collects a ``sample_size``-row sample and runs
    numpy Lloyd's driver-side — the FAISS operating practice (train on
    ~1e5-1e6 sampled vectors, add forever) and ~free vs per-iteration
    Spark jobs. Either way ``iters`` trades build cost for cell
    balance (recall at fixed n_probe), never correctness — probe-all
    equals brute force at any iteration count and any training mode."""
    if train == "sample":
        cent = ivf_centroids(
            train_df, vec_col, n_centroids, seed, sample_size, iters
        )
    else:
        cent = ivf_centroids_distributed(
            train_df, vec_col, id_col, n_centroids, seed, iters
        )
    vec_type = train_df.schema[vec_col].dataType
    t = SnapshotTable.create(
        spark,
        path,
        _index_schema(vec_type),
        key_cols=["cell", "vec_id"],
        order_cols=["ts"],
        n_buckets=n_buckets,
    )
    with open(os.path.join(path, "metadata", _CENTROID_FILE), "w") as f:
        json.dump(cent.tolist(), f)
    return t


def load_centroids(index: SnapshotTable) -> np.ndarray:
    with open(os.path.join(index.path, "metadata", _CENTROID_FILE)) as f:
        return np.asarray(json.load(f), dtype=np.float64)


def _assign_udf(cent: np.ndarray):
    cent_norm = cent / (np.linalg.norm(cent, axis=1, keepdims=True) + 1e-12)

    @F.pandas_udf(T.IntegerType())
    def assign_cell(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return pd.Series((m @ cent_norm.T).argmax(axis=1).astype(np.int32))

    return assign_cell


def ivf_index_sync(
    index: SnapshotTable,
    new_vecs: DataFrame,
    vec_col: str,
    id_col: str,
    applied_range: tuple[int, int] | None = None,
):
    """One incremental epoch: assign ONLY the new vectors to their
    nearest frozen centroid and merge the (cell, vec_id, vec) rows
    through the exactly-once ledger. Returns the CommitInfo; a replayed
    epoch is a no-op. Epoch ordering: the index's sync ordinal, like
    the dedup index — monotonic per applied epoch, replay-stable, and
    immune to ledger compaction. Keys are (cell, vec_id); frozen centroids make a
    vec_id's cell deterministic, so re-sent vectors LWW onto
    themselves rather than duplicating across cells."""
    cent = load_centroids(index)
    epoch = index.sync_ordinal() - 1
    assign = _assign_udf(cent)
    batch = new_vecs.select(
        assign(F.col(vec_col)).alias("cell"),
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.lit("insert").alias("op"),
        F.col(id_col).cast("long").alias("lsn"),
        F.timestamp_seconds(F.lit(epoch + 1)).alias("ts"),
    )
    # assignments hash across most buckets: skip the bucket pre-pass
    return index.merge_cdc(
        batch,
        applied_range=applied_range,
        mode="cow",
        source_is_raw=False,
        lineage=False,
        prune_buckets=False,
    )


def ivf_index_topk(
    index: SnapshotTable,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the maintained index: pick the ``n_probe`` nearest cells
    driver-side (k×dim matrix), bucket-prune the index read to those
    cells, exact-cosine re-rank the surviving vectors from the index's
    own payload. I/O is ~n_probe/n_centroids of the index and ZERO of
    the corpus (plan-asserted in tests/test_ann_index.py); with
    probe-all this equals brute force exactly (the oracle)."""
    cent = load_centroids(index)
    cent_norm = cent / (np.linalg.norm(cent, axis=1, keepdims=True) + 1e-12)
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) + 1e-12)
    probe = np.argsort(-(cent_norm @ qn))[: int(n_probe)].tolist()

    cand = (
        index.read(key_equals={"cell": [int(c) for c in probe]})
        .select(F.col("vec_id").alias(id_col), F.col("vec"))
    )
    return cosine_topk(cand, "vec", id_col, list(map(float, query)), k)
