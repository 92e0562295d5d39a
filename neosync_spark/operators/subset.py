"""Consistent subsetting along FK paths.

The reference plans INNER JOIN chains from each table to EVERY
where-clause root over the FK graph (BFS shortest path,
/root/reference/internal/runconfigs/builder.go:84-203; multi-column FK
joins and SQL generation
/root/reference/worker/pkg/select-query-builder/querybuilder.go:179-265)
so child tables are subset consistently with all root predicates
(intersection semantics).

Spark-first: the same semantics is a chain of LEFT SEMI joins — no row
widening, pushdown-friendly, broadcastable when the selected root set
is small. Composite foreign keys join on the full column tuple.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cols(c: str | Sequence[str]) -> tuple[str, ...]:
    return (c,) if isinstance(c, str) else tuple(c)


@dataclass(frozen=True)
class FkEdge:
    """child.fk_col references parent.pk_col (str or tuple of str for
    composite keys — both sides must have the same arity)."""

    child: str
    fk_col: str | tuple[str, ...]
    parent: str
    pk_col: str | tuple[str, ...]

    def __post_init__(self) -> None:
        if len(_cols(self.fk_col)) != len(_cols(self.pk_col)):
            raise ValueError(
                f"composite FK arity mismatch: {self.fk_col} vs {self.pk_col}"
            )


def semijoin_subset(
    child: DataFrame,
    parent_selected: DataFrame,
    fk_col: str | Sequence[str],
    pk_col: str | Sequence[str],
    broadcast: bool | None = None,
) -> DataFrame:
    """Rows of `child` whose FK tuple exists in the selected parent.

    ``broadcast``: None (default) lets Catalyst/AQE pick the strategy
    from size estimates — small selected-key sets still broadcast
    (autoBroadcastJoinThreshold), but a huge root selection falls back
    to a shuffled semijoin instead of OOMing the driver with a forced
    broadcast. True forces the hint; False forbids it."""
    fk, pk = _cols(fk_col), _cols(pk_col)
    keys = parent_selected.select(
        *[F.col(p).alias(f) for p, f in zip(pk, fk)]
    ).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    elif broadcast is False:
        keys = keys.hint("shuffle_hash")
    return child.join(keys, on=list(fk), how="left_semi")


def fk_violation_split(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str | Sequence[str],
    pk_col: str | Sequence[str],
    broadcast: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(applied, skipped): child rows whose FK tuple exists in the
    parent key set vs rows that would violate the constraint — the
    ``skip_foreign_key_violations`` analog (reference retries batches
    row by row, skipping FK violators and counting both,
    worker/pkg/benthos/sql/output_sql_insert.go:310-348; Spark-first
    this is one semi + one anti join on the same broadcastable key set,
    not a per-row retry loop).

    NULL semantics follow SQL ``MATCH SIMPLE``: a tuple with any NULL
    FK component cannot violate the constraint, so it lands in
    ``applied``.
    """
    fk, pk = _cols(fk_col), _cols(pk_col)
    keys = parent.select(*[F.col(p).alias(f) for p, f in zip(pk, fk)]).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    elif broadcast is False:
        keys = keys.hint("shuffle_hash")
    any_null = None
    for f_ in fk:
        c = F.col(f_).isNull()
        any_null = c if any_null is None else (any_null | c)
    non_null = child.filter(~any_null)
    applied = non_null.join(keys, on=list(fk), how="left_semi").unionByName(
        child.filter(any_null)
    )
    skipped = non_null.join(keys, on=list(fk), how="left_anti")
    return applied, skipped


def subset_tables(
    tables: dict[str, DataFrame],
    edges: list[FkEdge],
    root: str | None = None,
    root_predicate: str | None = None,
    roots: Mapping[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Filter each root table by its predicate, then propagate every
    root's selection to its descendants along FK edges (BFS per root,
    like the reference's per-root shortest-path planner). A table
    reachable from several roots is semijoined through each — the
    intersection, matching the reference's one-INNER-JOIN-chain-per-
    root plan. Call with a single (root, root_predicate) or a
    ``roots={table: predicate}`` mapping."""
    preds: dict[str, str] = dict(roots or {})
    if root is not None:
        if root_predicate is None:
            raise ValueError("root_predicate required with root")
        preds[root] = root_predicate
    if not preds:
        raise ValueError("at least one root predicate required")
    unknown = set(preds) - set(tables)
    if unknown:
        raise ValueError(f"root tables not in `tables`: {sorted(unknown)}")

    out = dict(tables)
    for r, pred in preds.items():
        out[r] = out[r].filter(pred)
    # BFS from each root over child edges; later roots see the state
    # already narrowed by earlier ones, so chained semijoins intersect
    for r in preds:
        frontier = [r]
        visited = {r}
        while frontier:
            nxt = []
            for parent in frontier:
                for e in edges:
                    if e.parent == parent and e.child not in visited:
                        out[e.child] = semijoin_subset(
                            out[e.child], out[parent], e.fk_col, e.pk_col
                        )
                        visited.add(e.child)
                        nxt.append(e.child)
            frontier = nxt
    return out
