"""Incremental JOIN-view maintenance over two SnapshotTables.

The denormalization half of downstream consumption: a view
``V = A ⋈ B`` (fact transcripts enriched with a dimension keyed by the
join column) is kept in sync from both tables' ``snapshot_diff``
outputs instead of re-joining 10^10 rows per refresh — the classic
delta-join rule ``ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB)`` materialized through the
same exactly-once ledger the event replay uses. (Reference analog:
none — Neosync recomputes nothing downstream; this extends the
``rollup.py`` incremental-view pattern from aggregates to joins.)

Scale shape: both diffs are bucket-pruned manifest comparisons; the
refresh re-reads the LEFT table semi-joined to the touched key set
(left-key changes directly, plus every left row whose JOIN key a
right-side change fans out to — that semi-join prunes to the join
key's buckets when it leads the left key); the right side joins at its
target snapshot (broadcast-able dimension — AQE decides). Work is
∝ |ΔA| + |A ⋈ ΔB| — the true fan-out of the change, never table size.

LWW ordinal: like rollup sync, every emitted event carries a SYNC
ordinal — ``(to_left, to_right)`` packed into one monotone scalar — as
both ``ts`` and ``lsn``, so the destination's (ts, lsn) LWW can never
judge a later sync stale, and the dst ledger's ``(prev, cur)`` range
makes re-running a sync a no-op.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lakehouse import CommitInfo, SnapshotTable

# snapshot ids pack into one monotone sync ordinal; 2^20 right-side
# snapshots between left-side advances is far beyond any real cadence
_SHIFT = 1 << 20


def _ordinal(left_sid: int | None, right_sid: int | None) -> int:
    return (left_sid or 0) * _SHIFT + (right_sid or 0)


def default_project(on: str, prefix: str = "dim_"):
    """LEFT join with the dimension's non-join columns prefixed (the
    denormalized-read shape). Returns a (left_df, right_df) -> df
    projection for ``incremental_join_sync``."""

    def _p(left: DataFrame, right: DataFrame) -> DataFrame:
        rcols = [
            F.col(c).alias(f"{prefix}{c}")
            for c in right.columns
            if c != on
        ]
        return left.join(right.select(F.col(on), *rcols), on, "left")

    return _p


def incremental_join_sync(
    left: SnapshotTable,
    right: SnapshotTable,
    dst: SnapshotTable,
    to_left: int,
    to_right: int,
    from_left: int | None = None,
    from_right: int | None = None,
    on: str = "conv_id",
    project: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
) -> CommitInfo:
    """Advance ``dst`` (keyed by the LEFT table's key columns) to
    reflect ``project(left@to_left, right@to_right)``.

    ``from_* = None`` is the initial full build. Otherwise only rows
    whose output can have changed are recomputed:

    - left-diff keys → re-projected (vanished left keys → deletes);
    - right-diff JOIN keys → every left row carrying such a key is
      re-projected (dimension fan-out, including rows whose dimension
      VANISHED — a left join must null them out again).

    ``project`` must not emit ``ts``/``lsn``/``op`` (the sync owns the
    LWW ordinal); carry event timestamps under another name. Re-running
    the same sync is a no-op via dst's ledger."""
    project = project or default_project(on)
    keys = left.manifest(refresh=True)["key_cols"]
    applied_range = (
        _ordinal(from_left, from_right), _ordinal(to_left, to_right)
    )
    if applied_range[0] == applied_range[1] or dst.is_applied(*applied_range):
        return CommitInfo(
            dst.manifest(refresh=True)["snapshot_id"], 0, 0, applied_range
        )

    def _check(df: DataFrame) -> DataFrame:
        bad = {"ts", "lsn", "op"} & set(df.columns)
        if bad:
            raise ValueError(
                f"project must not emit {sorted(bad)} — the sync owns the "
                "LWW ordinal; carry event timestamps under another name"
            )
        return df

    ordinal = applied_range[1]
    ts = F.timestamp_seconds(F.lit(ordinal))
    lsn = F.lit(ordinal).cast("long")
    l_state = left.read(snapshot_id=to_left)
    r_state = right.read(snapshot_id=to_right)

    if from_left is None and from_right is None:
        batch = (
            _check(project(l_state, r_state))
            .withColumn("ts", ts)
            .withColumn("op", F.lit("insert"))
            .withColumn("lsn", lsn)
        )
        return dst.merge_cdc(batch, applied_range=applied_range)

    l_diff = left.snapshot_diff(from_left or 0, to_left)
    r_diff = right.snapshot_diff(from_right or 0, to_right)
    touched_l = l_diff.select(*keys).distinct()
    touched_j = r_diff.select(on).distinct()
    # every current left row that must be re-projected: its own change,
    # or its dimension's change (semi-joins — no row duplication)
    refresh_keys = (
        l_state.join(touched_l, keys, "left_semi")
        .select(*keys)
        .unionByName(
            l_state.join(touched_j, on, "left_semi").select(*keys)
        )
        .distinct()
    )
    cur = _check(
        project(l_state.join(refresh_keys, keys, "left_semi"), r_state)
    )
    upserts = cur.withColumn("ts", ts).withColumn("op", F.lit("update"))
    vanished = touched_l.join(l_state.select(*keys), keys, "left_anti")
    payload = [f for f in cur.schema.fields if f.name not in keys]
    deletes = vanished.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in payload],
    ).withColumn("ts", ts).withColumn("op", F.lit("delete"))
    batch = upserts.unionByName(deletes).withColumn("lsn", lsn)
    return dst.merge_cdc(batch, applied_range=applied_range)
