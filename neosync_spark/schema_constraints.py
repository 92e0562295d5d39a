"""Constraint-aware schema management.

The reference introspects table constraints (PK/unique/check, foreign
keys, triggers) via sqlmanager (backend/pkg/sqlmanager/), diffs source
vs destination by fingerprint
(internal/schema-manager/shared/schema-diff.go:90-230), and reconciles
with ordered DDL: drop non-FK constraints, drop FK constraints in
dependency order (Kahn topological sort over the referenced→referencing
graph, cycles forcibly dropped —
internal/schema-manager/shared/foreign-keys.go:11-130), column ops,
then recreate non-FK before FK constraints
(internal/schema-manager/postgres/postgres.go:252-463).

Spark-first re-conception: a parquet lakehouse has no enforcing
engine, so constraints are DECLARED metadata with two faithful halves:

* the same fingerprint diff + reference-ordered reconcile PLAN
  (:func:`diff_constraints`, :func:`plan_reconcile`) so a job that
  manages a destination's constraint DDL reproduces the reference's
  statement ordering; and
* ENFORCEMENT as distributed validation jobs
  (:func:`validate_constraints`) — uniqueness is a groupBy, checks are
  a filter, FKs are an anti join; each is one Spark job that scales
  with the cluster instead of a per-row database error path.

Triggers/functions are DDL-copy concerns of a SQL destination with no
lakehouse analog; they are declared out of scope here (the reference
itself only drops/recreates their DDL text).
"""

from __future__ import annotations

import hashlib
from collections import deque
from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NON_FK_KINDS = ("primary_key", "unique", "check", "not_null")


@dataclass(frozen=True)
class Constraint:
    """Non-FK constraint: primary_key / unique / check / not_null."""

    name: str
    table: str
    kind: str
    columns: tuple[str, ...] = ()
    expr: str | None = None  # check constraints: a SQL boolean expression

    def __post_init__(self) -> None:
        if self.kind not in NON_FK_KINDS:
            raise ValueError(f"unknown constraint kind {self.kind!r}")
        if self.kind == "check" and not self.expr:
            raise ValueError("check constraint requires expr")
        if self.kind != "check" and not self.columns:
            raise ValueError(f"{self.kind} constraint requires columns")

    @property
    def fingerprint(self) -> str:
        raw = f"{self.table}|{self.kind}|{','.join(self.columns)}|{self.expr or ''}"
        return hashlib.md5(raw.encode()).hexdigest()


@dataclass(frozen=True)
class ForeignKey:
    """child.columns references parent.ref_columns."""

    name: str
    table: str
    columns: tuple[str, ...]
    ref_table: str
    ref_columns: tuple[str, ...]

    def __post_init__(self) -> None:
        if len(self.columns) != len(self.ref_columns):
            raise ValueError("composite FK arity mismatch")

    @property
    def fingerprint(self) -> str:
        raw = (
            f"{self.table}|{','.join(self.columns)}|"
            f"{self.ref_table}|{','.join(self.ref_columns)}"
        )
        return hashlib.md5(raw.encode()).hexdigest()


@dataclass
class ConstraintSet:
    constraints: dict[str, Constraint] = field(default_factory=dict)
    foreign_keys: dict[str, ForeignKey] = field(default_factory=dict)

    def add(self, c: Constraint | ForeignKey) -> "ConstraintSet":
        target = (
            self.foreign_keys if isinstance(c, ForeignKey) else self.constraints
        )
        if c.name in target:
            raise ValueError(f"duplicate constraint name {c.name!r}")
        target[c.name] = c
        return self


@dataclass
class ConstraintDiff:
    """Fingerprint diff, the schema-diff.go categories: in source only
    (create), in destination only (drop), different (drop+recreate —
    'the only way to update a constraint is to drop and recreate')."""

    create: list[Constraint | ForeignKey] = field(default_factory=list)
    drop: list[Constraint | ForeignKey] = field(default_factory=list)
    replace: list[Constraint | ForeignKey] = field(default_factory=list)


def diff_constraints(src: ConstraintSet, dst: ConstraintSet) -> ConstraintDiff:
    d = ConstraintDiff()
    for pool_src, pool_dst in (
        (src.constraints, dst.constraints),
        (src.foreign_keys, dst.foreign_keys),
    ):
        for name, c in pool_src.items():
            if name not in pool_dst:
                d.create.append(c)
            elif pool_dst[name].fingerprint != c.fingerprint:
                d.replace.append(c)
        for name, c in pool_dst.items():
            if name not in pool_src:
                d.drop.append(c)
    return d


def _fk_drop_order(fks: list[ForeignKey]) -> list[ForeignKey]:
    """Reference FK drop ordering (foreign-keys.go:11-130): Kahn
    topological sort over parent→child edges; constraints drop in
    REVERSE topological order of their referencing table (children's
    FKs before their parents'), self-references first, cycle members
    forcibly appended."""
    self_refs = [fk for fk in fks if fk.table == fk.ref_table]
    normal = [fk for fk in fks if fk.table != fk.ref_table]
    children: dict[str, set[str]] = {}
    in_degree: dict[str, int] = {}
    for fk in normal:
        children.setdefault(fk.ref_table, set())
        children.setdefault(fk.table, set())
        in_degree.setdefault(fk.ref_table, 0)
        in_degree.setdefault(fk.table, 0)
        if fk.table not in children[fk.ref_table]:
            children[fk.ref_table].add(fk.table)
            in_degree[fk.table] += 1
    queue = deque(sorted(t for t, deg in in_degree.items() if deg == 0))
    topo: list[str] = []
    while queue:
        t = queue.popleft()
        topo.append(t)
        for c in sorted(children.get(t, ())):
            in_degree[c] -= 1
            if in_degree[c] == 0:
                queue.append(c)
    pos = {t: i for i, t in enumerate(topo)}
    in_cycle = [fk for fk in normal if fk.table not in pos]
    ordered = sorted(
        (fk for fk in normal if fk.table in pos),
        key=lambda fk: (-pos[fk.table], fk.name),
    )
    return self_refs + ordered + in_cycle


def plan_reconcile(
    diff: ConstraintDiff, column_ops: list[dict] | None = None
) -> list[dict]:
    """Ordered reconcile plan, mirroring BuildSchemaDiffStatements /
    ReconcileDestinationSchema (postgres.go:252-531):

    1. drop non-FK constraints (dest-only + different)
    2. drop FK constraints (dest-only + different), dependency-ordered
    3. column ops (adds / type changes / drops — the caller's
       diff_schemas output, already DDL-ordered)
    4. recreate non-FK constraints (source-only + different)
    5. recreate FK constraints last, parents before children
    """
    plan: list[dict] = []
    non_fk_drop = [
        c for c in diff.drop + diff.replace if isinstance(c, Constraint)
    ]
    fk_drop = [c for c in diff.drop + diff.replace if isinstance(c, ForeignKey)]
    for c in non_fk_drop:
        plan.append({"op": "drop_constraint", "table": c.table, "name": c.name})
    for fk in _fk_drop_order(fk_drop):
        plan.append({"op": "drop_constraint", "table": fk.table, "name": fk.name})
    plan.extend(column_ops or [])
    non_fk_add = [
        c for c in diff.create + diff.replace if isinstance(c, Constraint)
    ]
    fk_add = [c for c in diff.create + diff.replace if isinstance(c, ForeignKey)]
    for c in non_fk_add:
        plan.append(
            {
                "op": "add_constraint",
                "table": c.table,
                "name": c.name,
                "kind": c.kind,
                "columns": list(c.columns),
                "expr": c.expr,
            }
        )
    for fk in reversed(_fk_drop_order(fk_add)):  # parents before children
        plan.append(
            {
                "op": "add_constraint",
                "table": fk.table,
                "name": fk.name,
                "kind": "foreign_key",
                "columns": list(fk.columns),
                "ref_table": fk.ref_table,
                "ref_columns": list(fk.ref_columns),
            }
        )
    return plan


def validate_constraints(
    tables: Mapping[str, DataFrame], cs: ConstraintSet
) -> DataFrame:
    """Distributed constraint enforcement: one row per constraint with
    its violation count — (constraint_name, table, kind, n_violations).

    Uniqueness/PK = hash groupBy (duplicate key tuples beyond the first
    count as violations); check = filter(NOT expr) with NULL counted as
    a pass (SQL check semantics); not_null = isNull count; FK = anti
    join against the parent key set (MATCH SIMPLE nulls pass). Each
    validation is a single shuffle or broadcastable join — the 100 TB
    path, vs the reference's per-row database error handling.
    """
    results: list[DataFrame] = []

    def tbl(name: str) -> DataFrame:
        if name not in tables:
            raise ValueError(f"constraint references unknown table {name!r}")
        return tables[name]

    for c in cs.constraints.values():
        df = tbl(c.table)
        if c.kind in ("primary_key", "unique"):
            # SQL NULLS DISTINCT: rows with a NULL key component never
            # collide, so the duplicate count runs over non-null tuples
            non_null = df
            for col in c.columns:
                non_null = non_null.filter(F.col(col).isNotNull())
            viol = (
                non_null.groupBy(*c.columns)
                .agg((F.count(F.lit(1)) - 1).alias("_extra"))
                .agg(F.coalesce(F.sum("_extra"), F.lit(0)).alias("n"))
            )
            if c.kind == "primary_key":
                # PK additionally forbids NULL key components: count
                # rows with any NULL key column
                any_null = None
                for col in c.columns:
                    n_ = F.col(col).isNull()
                    any_null = n_ if any_null is None else (any_null | n_)
                nulls = df.select(
                    F.coalesce(
                        F.sum(any_null.cast("long")), F.lit(0)
                    ).alias("n_null")
                )
                viol = viol.crossJoin(nulls).select(
                    (F.col("n") + F.col("n_null")).alias("n")
                )
        elif c.kind == "check":
            viol = df.select(
                F.coalesce(
                    F.sum((~F.coalesce(F.expr(c.expr), F.lit(True))).cast("long")),
                    F.lit(0),
                ).alias("n")
            )
        else:  # not_null
            cond = None
            for col in c.columns:
                n = F.col(col).isNull()
                cond = n if cond is None else (cond | n)
            viol = df.select(
                F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias("n")
            )
        results.append(
            viol.select(
                F.lit(c.name).alias("constraint_name"),
                F.lit(c.table).alias("table"),
                F.lit(c.kind).alias("kind"),
                F.col("n").cast("long").alias("n_violations"),
            )
        )

    from .operators.subset import fk_violation_split

    for fk in cs.foreign_keys.values():
        _, skipped = fk_violation_split(
            tbl(fk.table), tbl(fk.ref_table), list(fk.columns), list(fk.ref_columns)
        )
        results.append(
            skipped.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(fk.name).alias("constraint_name"),
                F.lit(fk.table).alias("table"),
                F.lit("foreign_key").alias("kind"),
                F.col("n").cast("long").alias("n_violations"),
            )
        )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
