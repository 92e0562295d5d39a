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

# Compatibility modes (the Confluent Schema Registry contract, mapped
# to relational StructTypes): a mode states which READER generation
# must be able to consume which WRITER generation's data, and is
# enforced at register() time so an incompatible producer schema is
# rejected BEFORE any event is written with it — the wire-governance
# layer a 10^10-event multi-producer feed needs.
COMPAT_NONE = "none"
COMPAT_BACKWARD = "backward"  # new schema reads data written by latest
COMPAT_FORWARD = "forward"  # latest schema reads data written by new
COMPAT_FULL = "full"  # both directions vs latest
COMPAT_BACKWARD_TRANSITIVE = "backward_transitive"  # vs ALL priors
COMPAT_FORWARD_TRANSITIVE = "forward_transitive"
COMPAT_FULL_TRANSITIVE = "full_transitive"

# Avro's type-promotion lattice mapped to Spark types: a reader of the
# VALUE type can consume data written as any of the KEY type.
_PROMOTIONS: dict[str, tuple[str, ...]] = {
    "tinyint": ("smallint", "int", "bigint", "float", "double"),
    "smallint": ("int", "bigint", "float", "double"),
    "int": ("bigint", "float", "double"),
    "bigint": ("float", "double"),
    "float": ("double",),
    "string": ("binary",),
    "binary": ("string",),
}


def can_read(reader: T.DataType, writer: T.DataType) -> bool:
    """True iff a field declared ``reader`` can consume values written
    as ``writer`` (identity or an Avro-style promotion)."""
    if reader == writer:
        return True
    return reader.simpleString() in _PROMOTIONS.get(writer.simpleString(), ())


class IncompatibleSchemaError(RuntimeError):
    """A schema version rejected by the registry's compatibility mode;
    ``violations`` lists each failed rule as a dict."""

    def __init__(self, mode: str, violations: list[dict]):
        self.mode = mode
        self.violations = violations
        super().__init__(
            f"schema incompatible under {mode!r}: {violations}"
        )


def _pairs(
    old: T.StructType, new: T.StructType, renames: dict[str, str]
) -> list[tuple[T.StructField | None, T.StructField | None]]:
    """Field pairing across a rename map (new_name -> old_name)."""
    old_by = {f.name: f for f in old.fields}
    out: list[tuple[T.StructField | None, T.StructField | None]] = []
    matched_old: set[str] = set()
    for f_ in new.fields:
        o = old_by.get(renames.get(f_.name, f_.name))
        if o is not None:
            matched_old.add(o.name)
        out.append((o, f_))
    for f_ in old.fields:
        if f_.name not in matched_old:
            out.append((f_, None))
    return out


def check_compatibility(
    old: T.StructType,
    new: T.StructType,
    mode: str,
    renames: dict[str, str] | None = None,
) -> list[dict]:
    """Violations of ``mode`` when evolving ``old`` → ``new`` (empty =
    compatible). BACKWARD = a consumer on ``new`` still reads data
    written under ``old``: added fields must be nullable (read as
    NULL from old rows) and shared fields may only promote old→new.
    FORWARD = a consumer still on ``old`` reads data written under
    ``new``: dropped fields must have been nullable in ``old`` (read
    as NULL from new rows) and shared fields may only promote
    new→old. FULL = both. Transitive variants apply the same rule
    against every prior version (handled by the registry)."""
    renames = renames or {}
    base = mode.replace("_transitive", "")
    if base == COMPAT_NONE:
        return []
    if base not in (COMPAT_BACKWARD, COMPAT_FORWARD, COMPAT_FULL):
        raise ValueError(f"unknown compatibility mode {mode!r}")
    viol: list[dict] = []
    backward = base in (COMPAT_BACKWARD, COMPAT_FULL)
    forward = base in (COMPAT_FORWARD, COMPAT_FULL)
    for o, n in _pairs(old, new, renames):
        if o is None:  # added by new
            if backward and not n.nullable:
                viol.append({
                    "rule": "backward", "field": n.name,
                    "why": "added field must be nullable (old data "
                           "lacks it)",
                })
        elif n is None:  # dropped by new
            if forward and not o.nullable:
                viol.append({
                    "rule": "forward", "field": o.name,
                    "why": "dropped field was non-nullable in the old "
                           "schema (old readers can't default it)",
                })
        else:
            if backward and not can_read(n.dataType, o.dataType):
                viol.append({
                    "rule": "backward", "field": n.name,
                    "why": f"{o.dataType.simpleString()} values don't "
                           f"promote to {n.dataType.simpleString()}",
                })
            if forward and not can_read(o.dataType, n.dataType):
                viol.append({
                    "rule": "forward", "field": n.name,
                    "why": f"{n.dataType.simpleString()} values don't "
                           f"promote back to {o.dataType.simpleString()}",
                })
    return viol


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
    # compatibility gate applied at register() time (COMPAT_*):
    # non-transitive modes check against the latest version only,
    # *_transitive against every prior version (rename maps are only
    # declared vs the immediate predecessor, so transitive checks
    # compose them hop by hop)
    compatibility: str = COMPAT_NONE

    def register(
        self,
        schema: T.StructType,
        effective_lsn: int = 0,
        renames: dict[str, str] | None = None,
    ) -> SchemaVersion:
        if self.versions and self.compatibility != COMPAT_NONE:
            rn = renames or {}
            if self.compatibility.endswith("_transitive"):
                # walk back through predecessors, composing rename maps
                # (new_name -> name in each older version)
                acc = dict(rn)
                viol = check_compatibility(
                    self.versions[-1].schema, schema,
                    self.compatibility, acc,
                )
                for older, newer in zip(
                    reversed(self.versions[:-1]), reversed(self.versions[1:])
                ):
                    step = newer.rename_map  # newer name -> older name
                    acc = {
                        new: step.get(old, old) for new, old in acc.items()
                    }
                    viol += check_compatibility(
                        older.schema, schema, self.compatibility, acc
                    )
            else:
                viol = check_compatibility(
                    self.versions[-1].schema, schema,
                    self.compatibility, rn,
                )
            if viol:
                raise IncompatibleSchemaError(self.compatibility, viol)
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


# ------------------------------------------------- persisted registries

_POLICIES = (
    POLICY_HALT, POLICY_HALT_NEW, POLICY_HALT_REMOVAL,
    POLICY_AUTOMAP, POLICY_PASSTHROUGH,
)
_COMPATS = (
    COMPAT_NONE, COMPAT_BACKWARD, COMPAT_FORWARD, COMPAT_FULL,
    COMPAT_BACKWARD_TRANSITIVE, COMPAT_FORWARD_TRANSITIVE,
    COMPAT_FULL_TRANSITIVE,
)


def load_registry(path: str) -> SchemaRegistry:
    """Load a declarative registry file (the config-driven analog of
    the reference's schema-manager job config):

    .. code-block:: json

        {"policy": "automap", "compatibility": "backward",
         "versions": [
           {"schema": "conv_id string, turn_idx int, text string",
            "effective_lsn": 0},
           {"schema": "conv_id string, turn_idx int, text string,
                       tool string",
            "effective_lsn": 500000, "renames": {"text": "body"}}]}

    Every version re-registers through the compatibility gate at load
    time, so an edited file that violates its own declared mode fails
    to load with the violation list — governance cannot be bypassed by
    editing the file. Schemas are Spark DDL strings (parsing needs an
    active SparkSession, which every CLI/job path has)."""
    import json as _json

    with open(path) as f:
        doc = _json.load(f)
    unknown = sorted(set(doc) - {"policy", "compatibility", "versions"})
    if unknown:
        raise ValueError(f"unknown registry keys in {path}: {unknown}")
    policy = doc.get("policy", POLICY_AUTOMAP)
    compat = doc.get("compatibility", COMPAT_NONE)
    if policy not in _POLICIES:
        raise ValueError(f"unknown policy {policy!r}; known: {_POLICIES}")
    if compat not in _COMPATS:
        raise ValueError(
            f"unknown compatibility {compat!r}; known: {_COMPATS}"
        )
    reg = SchemaRegistry(policy=policy, compatibility=compat)
    for i, v in enumerate(doc.get("versions", [])):
        vu = sorted(set(v) - {"schema", "effective_lsn", "renames"})
        if vu:
            raise ValueError(
                f"unknown keys in versions[{i}] of {path}: {vu}"
            )
        reg.register(
            T.StructType.fromDDL(v["schema"]),
            effective_lsn=int(v.get("effective_lsn", 0)),
            renames=dict(v.get("renames") or {}),
        )
    return reg


def save_registry(reg: SchemaRegistry, path: str) -> None:
    """Write the registry back as its declarative file form."""
    import json as _json

    doc = {
        "policy": reg.policy,
        "compatibility": reg.compatibility,
        "versions": [
            {
                "schema": ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in v.schema.fields
                ),
                "effective_lsn": v.effective_lsn,
                **({"renames": dict(v.renames)} if v.renames else {}),
            }
            for v in reg.versions
        ],
    }
    with open(path, "w") as f:
        _json.dump(doc, f, indent=2)
