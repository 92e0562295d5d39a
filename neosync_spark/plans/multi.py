"""Multi-table sync-and-anonymize — the reference's primary product
shape (datasync workflow over many tables,
/root/reference/worker/pkg/workflows/datasync/workflow/workflow.go:82):
tables load in FK-dependency waves (runconfigs analog, plans/dag.py),
each with column transformers; transformed key columns stay consistent
across tables via pure-function pseudonyms or an explicit broadcast
key mapping (the Redis-cache analog); a root WHERE clause subsets the
whole constellation consistently along FK edges.

Spark-first: each table sync is one declarative write; waves are
sequential, members of a wave are independent jobs (the reference caps
concurrency at 3 child workflows; in Spark, independent writes can
share the cluster via the scheduler — driver-side threading is an
option, sequential is deterministic and default).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.transformers import as_udf, key_col
from ..operators.keymap import apply_key_mapping, build_key_mapping
from ..operators.subset import FkEdge, subset_tables
from ..schema_constraints import ConstraintSet, diff_constraints, plan_reconcile
from ..schema_registry import POLICY_AUTOMAP, ensure_table_schema
from .dag import FkGraph, plan_run_configs
from .job import ColumnMapping, resolve_transformer


@dataclass
class TableSpec:
    name: str
    key_cols: list[str]
    mappings: list[ColumnMapping] = field(default_factory=list)
    # FK columns to rewrite through a parent's key mapping:
    # fk_col -> (parent_table, parent_key_col)
    fk_rewrites: dict[str, tuple[str, str]] = field(default_factory=dict)


@dataclass
class MultiTableJob:
    tables: dict[str, TableSpec]
    edges: list[FkEdge] = field(default_factory=list)
    subset_root: str | None = None
    subset_where: str | None = None
    seed: int = 42
    # source-declared constraints for the constellation (sqlmanager
    # introspection analog); reconciled against the destinations'
    # declared set during schema init
    constraints: ConstraintSet | None = None
    schema_policy: str = POLICY_AUTOMAP


# transformers whose outputs remain valid under the source column's
# numeric type; all others produce strings (destination column becomes
# text, as with the reference's text-typed pseudonyms)
_TYPE_PRESERVING = {
    "transform_int64", "transform_float64", "transform_int64_phone_number",
    "generate_int64", "generate_float64", "generate_card_number",
    "generate_unixtimestamp", "passthrough",
}


def _transform_table(spark: SparkSession, df: DataFrame, spec: TableSpec, seed: int) -> DataFrame:
    out = df
    k = key_col(*spec.key_cols)
    for m in spec.mappings:
        fn = resolve_transformer(m, seed)
        field_type = out.schema[m.column].dataType
        col = as_udf(fn)(F.col(m.column).cast("string"), k)
        if m.transformer in _TYPE_PRESERVING:
            col = col.cast(field_type)
        out = out.withColumn(m.column, col)
    return out


def declared_output_schema(
    spark: SparkSession, df: DataFrame, spec: TableSpec, seed: int
) -> T.StructType:
    """The schema the sync will actually produce for ``spec``: FK
    rewrites stringify their column, non-type-preserving transformers
    stringify theirs. Computed by Catalyst analysis over a LIMIT 0
    frame — no job runs."""
    z = df.limit(0)
    for fk_col in spec.fk_rewrites:
        z = z.withColumn(fk_col, F.col(fk_col).cast("string"))
    z = _transform_table(spark, z, spec, seed)
    return z.schema


def schema_init(
    spark: SparkSession,
    job: MultiTableJob,
    sources: dict[str, DataFrame],
    destinations: "dict[str, object]",
    dest_constraints: ConstraintSet | None = None,
) -> dict:
    """SchemaInit-before-sync: evolve every destination's physical
    schema to the declared post-transform shape and emit the constraint
    reconcile plan in reference DDL order — BEFORE any wave loads
    (reference runs SchemaInit child workflows per destination first:
    worker/pkg/workflows/datasync/workflow/workflow.go:191-202;
    internal/schema-manager/mysql/mysql.go:59,220,353).

    Destination key/order columns (e.g. the lakehouse ``ts`` ordering
    column) are system columns, not drift — they are kept even when the
    source lacks them. Returns {"column_ops": {table: ops},
    "reconcile_plan": [ordered DDL-shaped dicts]}."""
    col_ops: dict[str, list[dict]] = {}
    all_ops: list[dict] = []
    for name, dest in destinations.items():
        spec = job.tables[name]
        declared = declared_output_schema(spark, sources[name], spec, job.seed)
        m = dest.manifest()
        protected = set(m.get("key_cols") or []) | set(m.get("order_cols") or [])
        names = {f.name for f in declared.fields}
        fields = list(declared.fields)
        for f_ in dest.current_schema().fields:
            if f_.name in protected and f_.name not in names:
                fields.append(f_)
        ops = ensure_table_schema(
            dest, T.StructType(fields), policy=job.schema_policy
        )
        col_ops[name] = ops
        all_ops.extend(ops)
    cdiff = diff_constraints(
        job.constraints or ConstraintSet(),
        dest_constraints or ConstraintSet(),
    )
    return {
        "column_ops": col_ops,
        "reconcile_plan": plan_reconcile(cdiff, all_ops),
    }


def run_multi_table_sync(
    spark: SparkSession,
    job: MultiTableJob,
    sources: dict[str, DataFrame],
    write: "callable[[str, DataFrame], None] | None" = None,
    destinations: "dict[str, object] | None" = None,
    dest_constraints: ConstraintSet | None = None,
    catalog=None,
) -> dict[str, DataFrame]:
    """Plan + execute: schema-init the destinations, subset along FK
    edges, order by the DAG, apply per-table transforms, rewrite FKs
    through parent key mappings. Returns the synced frames (and writes
    each via `write` if given; tables named in ``destinations`` —
    SnapshotTables — are merged through the exactly-once ledger with
    LWW over whatever rows the destination already held).

    ``catalog`` (plans/catalog.Catalog): after EVERY wave has loaded,
    re-pin all destination tables in one atomic catalog publish —
    readers resolving through the catalog flip from the pre-sync
    multi-table view to the post-sync one in a single version step,
    never observing some tables synced and others not (the cross-table
    visibility guarantee the per-table ledgers alone cannot give).
    """
    # 0. schema init BEFORE any data moves (SchemaInit analog): the
    # destination's physical schema and constraint plan converge first,
    # so every wave writes into the declared shape
    init_report = None
    if destinations:
        init_report = schema_init(
            spark, job, sources, destinations, dest_constraints
        )

    # 1. consistent subsetting (querybuilder/subset analog)
    frames = dict(sources)
    if job.subset_root and job.subset_where:
        frames = subset_tables(frames, job.edges, job.subset_root, job.subset_where)

    # 2. dependency order (runconfigs analog)
    g = FkGraph()
    for e in job.edges:
        g.add(e.child, e.parent, e.fk_col)
    for t in job.tables:
        g.edges.setdefault(t, [])
    configs = plan_run_configs(g)

    # 3. per-table transform + FK rewrite, parents first
    out: dict[str, DataFrame] = {}
    key_maps: dict[tuple[str, str], DataFrame] = {}
    for cfg in configs:
        if cfg.run_type != "insert" or cfg.table not in job.tables:
            continue
        spec = job.tables[cfg.table]
        df = frames[cfg.table]
        # rewrite FKs through already-built parent mappings
        for fk_col, (ptable, pkey) in spec.fk_rewrites.items():
            mapping = key_maps.get((ptable, pkey))
            if mapping is None:
                raise ValueError(
                    f"{cfg.table}.{fk_col}: parent mapping {ptable}.{pkey} not built yet"
                )
            # pseudonymized keys are strings; align the FK type before
            # the broadcast-mapping join
            df = df.withColumn(fk_col, F.col(fk_col).cast("string"))
            df = apply_key_mapping(df, mapping, fk_col, null_on_miss=True)
        df = _transform_table(spark, df, spec, job.seed)
        # if a key column is transformed, publish its old->new mapping
        for m in spec.mappings:
            if m.column in spec.key_cols:
                fn = resolve_transformer(m, job.seed)
                key_maps[(cfg.table, m.column)] = build_key_mapping(
                    frames[cfg.table].select(F.col(m.column).cast("string").alias(m.column)),
                    m.column,
                    fn,
                )
        out[cfg.table] = df
        if write is not None:
            write(cfg.table, df)
        if destinations and cfg.table in destinations:
            _merge_into_destination(destinations[cfg.table], df, spec)
    if catalog is not None and destinations:
        catalog.publish(dict(destinations))
    return out


def _merge_into_destination(dest, df: DataFrame, spec: TableSpec) -> None:
    """Load one synced frame into its SnapshotTable destination through
    the ledgered merge (the ON CONFLICT DO UPDATE analog): each synced
    row is an upsert keyed by the table's keys, stamped with the
    destination's applied-epoch count so later syncs LWW over earlier
    rows (and over any pre-existing destination rows). A crash-replayed
    sync is a table no-op."""
    epoch = dest.sync_ordinal() - 1
    cur = dest.current_schema()
    key_cols = dest.manifest().get("key_cols") or spec.key_cols
    have = set(df.columns)
    cols = []
    for f_ in cur.fields:
        if f_.name == "ts":
            continue
        if f_.name in have:
            cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
        else:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    batch = df.select(
        *cols,
        F.lit("insert").alias("op"),
        # deterministic within-batch lsn; keys are unique per batch so
        # only the (ts, lsn) pair's cross-epoch ordering matters
        F.xxhash64(*[F.col(k).cast("string") for k in key_cols]).alias("lsn"),
        F.timestamp_seconds(F.lit(epoch + 1)).alias("ts"),
    )
    dest.merge_cdc(
        batch,
        applied_range=(epoch, epoch + 1),
        mode="cow",
        source_is_raw=False,
        lineage=False,
    )
