"""Active-active (multi-master) CDC conflict resolution.

The reference syncs ONE source to destinations; real deployments often
run the same logical table behind two or more writable regions, each
emitting its own change log with its own LSN space. LSNs are not
comparable across sites, wall-clock timestamps are comparable but
collide, so a merged view needs an explicit deterministic total order —
the classic active-active LWW register (Shapiro et al., CRDT
literature; DynamoDB global tables / Postgres BDR semantics):

    winner per key = max by (ts, [delete?], site_priority, lsn)

- ``ts`` first: latest wall-clock write wins across sites.
- ``delete_wins`` (optional): on a ts tie ACROSS sites a delete beats a
  concurrent update — the standard anti-resurrection choice (a key
  deleted in one region while updated in another stays deleted).
- ``site_priority``: a fixed site ranking breaks remaining ts ties
  deterministically (every replica picks the same winner — convergence
  is the whole point).
- ``lsn`` last: within one site the binlog order is authoritative.

Physical plan: exactly the skew-proof shape of ``lww_dedup`` — the
union of the site logs is ONE groupBy(key).agg(max_by(payload, rank)),
partial + final hash aggregation, map-side combine, one shuffle. No
window, no join; a hot key's millions of cross-site updates collapse
map-side. At 10^10 events per site the merged fold costs the same as a
single-site fold of the union.

``site_divergence_report`` is the ops-side complement: per key, does
each site's OWN latest state agree? Two hash aggregates (key×site →
key), no join — the reconciliation worklist for an active-active
deployment drifting apart.

No reference counterpart file; public replication literature only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _site_rank(site_col: str, site_priority: Sequence[str]):
    """Higher = wins. Sites not in the priority list lose to listed
    ones (rank -1) and tie among themselves (lsn then decides)."""
    expr = F.lit(-1)
    n = len(site_priority)
    for i, s in enumerate(site_priority):
        # earlier in the list = higher priority
        expr = F.when(F.col(site_col) == s, F.lit(n - i)).otherwise(expr)
    return expr


def multimaster_merge(
    log: DataFrame,
    key_cols: Sequence[str],
    site_priority: Sequence[str],
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    site_col: str = "site",
    op_col: str = "op",
    delete_wins: bool = True,
) -> DataFrame:
    """One converged winner row per key from a union of per-site logs.

    ``log`` carries one row per change event with a ``site_col`` tag;
    LSNs need only be monotone WITHIN a site. Returns every column of
    ``log`` for the winning event (deletes included — callers filter
    ``op != 'delete'`` for the visible state, keep them for tombstone
    propagation).
    """
    other = [c for c in log.columns if c not in key_cols]
    rank_parts = [F.col(ts_col)]
    if delete_wins:
        rank_parts.append((F.col(op_col) == "delete").cast("int"))
    rank_parts.append(_site_rank(site_col, site_priority))
    rank_parts.append(F.col(lsn_col))
    rank = F.struct(*rank_parts)
    payload = F.struct(*[F.col(c) for c in other])
    agg = log.groupBy(*key_cols).agg(F.max_by(payload, rank).alias("_w"))
    return agg.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in other]
    )


def site_divergence_report(
    log: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    site_col: str = "site",
    op_col: str = "op",
) -> DataFrame:
    """Keys whose sites' OWN latest states disagree.

    Per (key, site) take the site-local LWW state (max by (ts, lsn) —
    within one site that order is total) as a STRUCT of
    (op, payload...) — struct equality gives exact NULL semantics, no
    string-sentinel collisions — then per key count sites and distinct
    states. Rows with ``n_states > 1`` are the reconciliation
    worklist. Two hash aggregates, no join, no window.
    """
    fp = F.struct(F.col(op_col), *[F.col(c) for c in payload_cols])
    rank = F.struct(F.col(ts_col), F.col(lsn_col))
    per_site = log.groupBy(*key_cols, site_col).agg(
        F.max_by(fp, rank).alias("_state")
    )
    return (
        per_site.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sites"),
            F.countDistinct("_state").cast("long").alias("n_states"),
        )
        .filter(F.col("n_states") > 1)
    )
