"""Leakage-safe train/val/test split assignment.

Splitting a pretraining corpus doc-by-doc leaks evaluation data: two
near-duplicate documents land on opposite sides of the split and the
eval set silently overlaps the training set (the contamination Lee et
al. 2022 "Deduplicating Training Data Makes Language Models Better"
measures, and the reason benchmark decontamination exists at all). The
fix is standard: assign splits at the NEAR-DUP-CLUSTER granularity —
every member of a cluster shares one membership draw, so a cluster is
wholly train or wholly eval, never both.

This module composes the corpus dedup grouping
(:func:`..similarity.minhash_dedup_clusters` or any ``(id,
cluster_id)`` frame — SemDeDup embedding clusters work too) with the
repo's deterministic hash-keyed membership (same md5-bucket arithmetic
as ``deterministic_sample`` / ``stratified_sample``: a pure function of
the cluster key, identical in any engine, replay/retry stable).

Scale shape (100 TB corpus, 1000 executors):
- the cluster map holds ONLY docs that have a near-duplicate — on a
  deduplicated-ish corpus that is a small fraction of the table, so the
  left join is AQE-broadcast; singletons default to their own id with
  zero extra work;
- split assignment itself is one JVM projection (md5 / conv / chained
  CASE) — no shuffle, no Python;
- determinism: split(doc) depends only on (seed, cluster key), so
  adding documents later never reshuffles existing assignments unless
  new edges merge clusters (the same stability contract an incremental
  dedup index gives).

No reference counterpart (nucleuscloud/neosync has no corpus-split
surface); part of the training-data-pipeline layer, public method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def leakage_safe_splits(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame | None,
    fractions: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split drawn per CLUSTER, not per doc.

    ``clusters`` is an ``(id_col, cluster_id)`` frame (extra columns
    ignored; ``None`` degenerates to doc-level assignment). Docs absent
    from it are singleton clusters keyed by their own id. ``fractions``
    maps split name -> fraction in DICT ORDER; they must sum to ~1 and
    the last split absorbs the rounding residue, so every row gets a
    split. The draw is ``md5('ns-split|seed|' || cluster_key)`` bucketed
    into 10^6 — cumulative ranges in dict order.
    """
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1.0, got {total}")

    if clusters is not None:
        # the map holds only docs WITH a near-duplicate — small by
        # construction on a deduplicated-ish corpus, so broadcast
        # explicitly (createDataFrame/fresh-parquet inputs carry no
        # stats for AQE to decide from; a sort-merge join here would
        # shuffle the 100 TB side)
        cmap = F.broadcast(
            clusters.select(
                F.col(id_col), F.col("cluster_id").alias("_ns_cluster")
            )
        )
        df = df.join(cmap, id_col, "left")
        key = F.coalesce(F.col("_ns_cluster"), F.col(id_col))
    else:
        key = F.col(id_col)

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"ns-split|{seed}|"), key.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _BUCKETS
    )

    # cumulative ranges in dict order; the LAST split takes everything
    # past the second-to-last threshold, absorbing rounding residue
    names = list(fractions)
    expr = None
    cum = 0
    for name in names[:-1]:
        cum += int(fractions[name] * _BUCKETS)
        cond = bucket < F.lit(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    split = (
        expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    )

    out = df.withColumn(split_col, split)
    return out.drop("_ns_cluster") if clusters is not None else out


def split_leakage_report(
    assigned: DataFrame,
    clusters: DataFrame,
    id_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Audit: clusters whose members straddle >1 split (must be empty
    for any cluster-keyed assignment — this is the invariant
    ``leakage_safe_splits`` exists to provide, and the one a doc-keyed
    split violates). One hash-agg over the cluster map joined to the
    assignment; returns ``(cluster_id, n_splits, splits)``."""
    cmap = clusters.select(F.col(id_col), "cluster_id")
    joined = assigned.select(id_col, split_col).join(cmap, id_col)
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.countDistinct(split_col).alias("n_splits"),
            F.sort_array(F.collect_set(split_col)).alias("splits"),
        )
        .filter(F.col("n_splits") > 1)
    )
