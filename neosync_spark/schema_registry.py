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

POLICY_HALT = "halt"  # any drift fails the job
POLICY_HALT_NEW = "halt-on-new-column"  # adds fail; drops/renames apply
POLICY_HALT_REMOVAL = "halt-on-column-removal"  # drops fail; adds apply
POLICY_AUTOMAP = "automap"  # apply adds + widenings + drops + renames
POLICY_PASSTHROUGH = "passthrough"  # ignore drift; extra cols dropped


@dataclass(frozen=True)
class SchemaVersion:
    version: int
    schema: T.StructType
    effective_lsn: int = 0
    # new_name -> old_name column renames vs the PREVIOUS version
    renames: tuple[tuple[str, str], ...] = ()

    @property
    def rename_map(self) -> dict[str, str]:
        return dict(self.renames)


@dataclass
class SchemaRegistry:
    versions: list[SchemaVersion] = field(default_factory=list)
    policy: str = POLICY_AUTOMAP

    def register(
        self,
        schema: T.StructType,
        effective_lsn: int = 0,
        renames: dict[str, str] | None = None,
    ) -> SchemaVersion:
        v = SchemaVersion(
            len(self.versions) + 1,
            schema,
            effective_lsn,
            tuple((renames or {}).items()),
        )
        self.versions.append(v)
        return v

    def version_for_lsn(self, lsn: int) -> SchemaVersion:
        """Declared schema in force at a given log position."""
        applicable = [v for v in self.versions if v.effective_lsn <= lsn]
        if not applicable:
            return self.versions[0]
        return max(applicable, key=lambda v: (v.effective_lsn, v.version))


def diff_schemas(
    current: T.StructType,
    declared: T.StructType,
    renames: dict[str, str] | None = None,
) -> list[dict]:
    """Ordered ALTER ops to evolve `current` into `declared`.

    Ordering mirrors the reference (renames/drops first, then type
    alters, then column adds — mysql.go:220-351). ``renames`` maps
    declared new_name -> current old_name.
    """
    renames = renames or {}
    ops: list[dict] = []
    cur = {f.name: f for f in current.fields}
    renamed_away = set(renames.values())
    for new_name, old_name in renames.items():
        if old_name in cur:
            ops.append({"op": "rename_column", "from": old_name, "to": new_name})
    for f_ in declared.fields:
        old = cur.get(renames.get(f_.name, f_.name))
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
    declared_names = {f.name for f in declared.fields}
    for name in cur:
        if name not in declared_names and name not in renamed_away:
            ops.append({"op": "drop_column", "name": name})
    order = {"rename_column": 0, "drop_column": 1, "alter_column_type": 2, "add_column": 3}
    return sorted(ops, key=lambda o: (order[o["op"]], o.get("name", o.get("to", ""))))


def ensure_table_schema(
    table: SnapshotTable,
    declared: T.StructType,
    policy: str = POLICY_AUTOMAP,
    renames: dict[str, str] | None = None,
) -> list[dict]:
    """Reconcile the table with a declared schema version under the
    job's drift policy (reference builders/sql.go:93-152). Returns the
    ops applied (empty = already in sync)."""
    current = table.current_schema()
    ops = diff_schemas(current, declared, renames)
    if not ops:
        return []
    if policy == POLICY_HALT:
        raise RuntimeError(f"schema drift under halt policy: {ops}")
    if policy == POLICY_PASSTHROUGH:
        return []
    adds = [o for o in ops if o["op"] == "add_column"]
    drops = [o for o in ops if o["op"] == "drop_column"]
    if policy == POLICY_HALT_NEW and adds:
        raise RuntimeError(f"new columns under {POLICY_HALT_NEW}: {adds}")
    if policy == POLICY_HALT_REMOVAL and drops:
        raise RuntimeError(f"column removal under {POLICY_HALT_REMOVAL}: {drops}")
    table.alter_schema(declared, renames=renames)
    return ops
