"""Consistent subsetting along FK paths.

The reference plans INNER JOIN chains from each table to every
where-clause root over the FK graph (BFS shortest path,
/root/reference/internal/runconfigs/builder.go:84-203; SQL generation
/root/reference/worker/pkg/select-query-builder/querybuilder.go:179-265)
so child tables are subset consistently with a root predicate.

Spark-first: the same semantics is a chain of LEFT SEMI joins — no row
widening, pushdown-friendly, broadcastable when the selected root set
is small.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FkEdge:
    """child.fk_col references parent.pk_col."""

    child: str
    fk_col: str
    parent: str
    pk_col: str


def semijoin_subset(
    child: DataFrame,
    parent_selected: DataFrame,
    fk_col: str,
    pk_col: str,
    broadcast: bool = True,
) -> DataFrame:
    """Rows of `child` whose FK exists in the selected parent rows."""
    keys = parent_selected.select(F.col(pk_col).alias(fk_col)).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    return child.join(keys, on=fk_col, how="left_semi")


def subset_tables(
    tables: dict[str, DataFrame],
    edges: list[FkEdge],
    root: str,
    root_predicate: str,
) -> dict[str, DataFrame]:
    """Filter `root` by the predicate, then propagate the selection to
    all descendants along FK edges (BFS, like the reference's
    shortest-path planner — each table subset via its parent chain)."""
    out = dict(tables)
    out[root] = tables[root].filter(root_predicate)
    # BFS from root over child edges
    frontier = [root]
    visited = {root}
    while frontier:
        nxt = []
        for parent in frontier:
            for e in edges:
                if e.parent == parent and e.child not in visited:
                    out[e.child] = semijoin_subset(
                        tables[e.child], out[parent], e.fk_col, e.pk_col
                    )
                    visited.add(e.child)
                    nxt.append(e.child)
        frontier = nxt
    return out
