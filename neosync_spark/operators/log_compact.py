"""Changelog (WAL) compaction — Kafka compacted-topic semantics.

At 10^10 change events the dominant cost of BOOTSTRAPPING a new
consumer (a fresh destination, a new replica, a rebuilt index) is not
the destination merge — it is reading the log itself: every historical
update to every key, most of which the final LWW state throws away.
Kafka solves this with log compaction (retain only the latest record
per key, deletes as bounded-retention tombstones); Debezium consumers
rely on it for snapshot-free bootstrap. The reference's analog is its
archive replay path (`neosync_connection_data` re-reads the full run
archive — worker/pkg/benthos/sql/input_neosync_connection_data.go),
which is exactly the O(events) cost this operator removes.

``compact_changelog`` rewrites a changelog to ONE event per key — the
LWW winner under the (order_cols) tuple — so a bootstrap replays
O(live keys) events instead of O(history). The invariant (proved by
the `cdc_log_compaction` gate query and `tests/test_log_compact.py`):
replaying the compacted log through the engine yields EXACTLY the
final table state of replaying the full log.

Semantics:

* The winner row keeps its original ``op``: the engine's MERGE is an
  upsert (an `update` whose key is absent inserts — the same property
  that makes lsn-windowed batch replay correct), so no op rewriting
  is needed.
* A key whose latest event is a delete stays in the compacted log as
  a TOMBSTONE (its full delete event). Tombstones matter when the
  compacted log may be applied over a destination that already holds
  the key; ``drop_tombstones=True`` removes them for the pure
  fresh-bootstrap case (Kafka's post-`delete.retention.ms` state).
* ``patch_ops=True`` additionally folds partial images (``op='patch'``
  rows set only their non-NULL payload columns — the MySQL minimal
  row-image / Debezium partial envelope case) into FULL images via
  ``operators.dedup.patch_fold``: the compacted log never contains a
  patch, so it can bootstrap a destination with no patch support.
  Orphan patches (no full image anywhere in the log) are dropped and
  post-delete patches do not resurrect, both inherited from the fold.
* The winners carry their original ``order_cols`` (ts, lsn), so the
  compacted log's max lsn is the exact WAL watermark: a consumer
  bootstraps from the compacted log, then tails the live WAL from
  ``lsn_hi + 1`` — the manifest written by ``write_compacted_log``
  records it.

Scale shape: ONE hash aggregation (groupBy(key).max_by) — partial +
final agg, so a hot key's million updates collapse map-side before
the shuffle; no window, no join, no second pass. The write
repartitions by key hash into evenly-sized files so the compacted
log's parallelism is key-uniform regardless of how skewed the input
file layout was.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import KEY_COLS, ORDER_COLS
from .dedup import lww_dedup, patch_fold

MANIFEST_NAME = "_compaction.json"


def compact_changelog(
    log: DataFrame,
    key_cols: Sequence[str] = tuple(KEY_COLS),
    order_cols: Sequence[str] = tuple(ORDER_COLS),
    op_col: str = "op",
    drop_tombstones: bool = False,
    patch_ops: bool = False,
) -> DataFrame:
    """The compacted view of ``log``: one event per key, original
    column order preserved (the result replays through the same job
    path as the raw WAL)."""
    cols = list(log.columns)
    if op_col not in cols:
        raise ValueError(f"changelog has no op column {op_col!r}")
    if patch_ops:
        payload = [
            c
            for c in cols
            if c not in {*key_cols, *order_cols, op_col}
        ]
        src = (
            log.withColumn("_patch", F.col(op_col) == "patch")
            .withColumn("_del", F.col(op_col) == "delete")
            .drop(op_col)
        )
        won = patch_fold(
            src, key_cols, order_cols, payload, "_patch", "_del"
        )
        won = won.withColumn(
            op_col,
            F.when(F.coalesce(F.col("_del"), F.lit(False)), "delete")
            .otherwise("update"),
        ).drop("_del")
    else:
        won = lww_dedup(log, key_cols, order_cols)
    if drop_tombstones:
        won = won.filter(F.col(op_col) != "delete")
    return won.select(*cols)


def write_compacted_log(
    compacted: DataFrame,
    out_dir: str,
    key_cols: Sequence[str] = tuple(KEY_COLS),
    lsn_col: str = "lsn",
    op_col: str = "op",
    n_files: int | None = None,
) -> dict:
    """Write the compacted log as parquet plus a ``_compaction.json``
    manifest carrying the WAL watermark (``lsn_hi``) a consumer tails
    the live log from after bootstrapping here.

    Files are repartitioned by key hash (sized by ``n_files``, default
    the session shuffle parallelism) and sorted by key within each
    file so per-key locality survives the rewrite.
    """
    spark = compacted.sparkSession
    n = n_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        compacted.repartition(n, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    agg = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(lsn_col).alias("lsn_hi"),
        F.sum((F.col(op_col) == "delete").cast("long")).alias("tombs"),
    ).collect()[0]
    manifest = {
        "events_out": int(agg["n"]),
        "lsn_hi": int(agg["lsn_hi"]) if agg["lsn_hi"] is not None else None,
        "tombstones": int(agg["tombs"] or 0),
        "key_cols": list(key_cols),
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def read_compaction_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def compact_changelog_dir(
    spark: SparkSession,
    log_dir: str,
    out_dir: str,
    key_cols: Sequence[str] = tuple(KEY_COLS),
    order_cols: Sequence[str] = tuple(ORDER_COLS),
    op_col: str = "op",
    drop_tombstones: bool = False,
    patch_ops: bool = False,
    n_files: int | None = None,
    base_dir: str | None = None,
) -> dict:
    """Dir → dir convenience used by the CLI: read, compact, write,
    and report ``events_in`` alongside the write manifest.

    ``base_dir`` = a PRIOR compacted log: incremental recompaction
    (Kafka's log cleaner never re-reads cleaned segments). Only the
    WAL suffix past the base manifest's ``lsn_hi`` is read — the lsn
    filter is pushed into the parquet scan, so already-compacted
    history costs footer reads only — and folded onto the base's
    one-event-per-key state: O(live keys + new events). The result is
    identical to recompacting the full log from scratch (LWW is
    associative: max_by over (base winners ∪ suffix) == max_by over
    the whole history). A base compacted WITH tombstones is required
    when the suffix can delete (drop_tombstones composes only at the
    final output)."""
    log = spark.read.parquet(log_dir)
    if base_dir is not None:
        base_m = read_compaction_manifest(base_dir)
        if base_m is None:
            raise ValueError(f"{base_dir!r} has no {MANIFEST_NAME}")
        lsn_col = order_cols[-1]
        suffix = log.filter(F.col(lsn_col) > F.lit(int(base_m["lsn_hi"])))
        base = spark.read.parquet(base_dir).select(*log.columns)
        log = base.unionByName(suffix)
    comp = compact_changelog(
        log,
        key_cols,
        order_cols,
        op_col=op_col,
        drop_tombstones=drop_tombstones,
        patch_ops=patch_ops,
    )
    manifest = write_compacted_log(
        comp, out_dir, key_cols, lsn_col=order_cols[-1], op_col=op_col,
        n_files=n_files,
    )
    manifest["events_in"] = log.count()
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh)
    return manifest
