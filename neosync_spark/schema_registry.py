"""Declarative schema registry + drift policies.

The reference introspects source schemas before any data flows and
reconciles destination DDL via an ordered schema diff
(/root/reference/internal/schema-manager/mysql/mysql.go:220-351
BuildSchemaDiffStatements → ReconcileDestinationSchema) with job-level
drift policies halt-on-new-column / halt-on-column-removal /
passthrough / auto-map
(/root/reference/internal/benthos/benthos-builder/builders/sql.go:93-152).

Here: the registry declares schema VERSIONS, each effective from an lsn
(the change log carries the evolution point); before applying a batch
the engine diffs the table's current schema against the declared one
and issues the ordered ALTER ops (add nullable columns, widen types) —
against our SnapshotTable as a metadata-only commit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from .lakehouse import SnapshotTable

POLICY_HALT = "halt"
POLICY_AUTOMAP = "automap"  # apply adds + widenings automatically
POLICY_PASSTHROUGH = "passthrough"  # ignore drift; extra cols dropped


@dataclass(frozen=True)
class SchemaVersion:
    version: int
    schema: T.StructType
    effective_lsn: int = 0


@dataclass
class SchemaRegistry:
    versions: list[SchemaVersion] = field(default_factory=list)
    policy: str = POLICY_AUTOMAP

    def register(self, schema: T.StructType, effective_lsn: int = 0) -> SchemaVersion:
        v = SchemaVersion(len(self.versions) + 1, schema, effective_lsn)
        self.versions.append(v)
        return v

    def version_for_lsn(self, lsn: int) -> SchemaVersion:
        """Declared schema in force at a given log position."""
        applicable = [v for v in self.versions if v.effective_lsn <= lsn]
        if not applicable:
            return self.versions[0]
        return max(applicable, key=lambda v: (v.effective_lsn, v.version))


def diff_schemas(current: T.StructType, declared: T.StructType) -> list[dict]:
    """Ordered ALTER ops to evolve `current` into `declared`.

    Ordering mirrors the reference (drops/renames first, then column
    adds, then type alters — mysql.go:220-351); we support adds and
    widenings (drops are rejected by SnapshotTable).
    """
    ops: list[dict] = []
    cur = {f.name: f for f in current.fields}
    for f_ in declared.fields:
        old = cur.get(f_.name)
        if old is None:
            ops.append({"op": "add_column", "name": f_.name, "type": f_.dataType.simpleString()})
        elif old.dataType != f_.dataType:
            ops.append(
                {
                    "op": "alter_column_type",
                    "name": f_.name,
                    "from": old.dataType.simpleString(),
                    "to": f_.dataType.simpleString(),
                }
            )
    for name in cur:
        if name not in {f.name for f in declared.fields}:
            ops.append({"op": "drop_column", "name": name})
    # drops first (reference order), then type alters, then adds
    order = {"drop_column": 0, "alter_column_type": 1, "add_column": 2}
    return sorted(ops, key=lambda o: (order[o["op"]], o["name"]))


def ensure_table_schema(
    table: SnapshotTable, declared: T.StructType, policy: str = POLICY_AUTOMAP
) -> list[dict]:
    """Reconcile the table with a declared schema version. Returns the
    ops applied (empty = already in sync)."""
    current = table.current_schema()
    ops = diff_schemas(current, declared)
    if not ops:
        return []
    if policy == POLICY_HALT:
        raise RuntimeError(f"schema drift under halt policy: {ops}")
    if policy == POLICY_PASSTHROUGH:
        return []
    drops = [o for o in ops if o["op"] == "drop_column"]
    if drops:
        raise RuntimeError(f"column removal not supported: {drops}")
    table.alter_schema(declared)
    return ops
