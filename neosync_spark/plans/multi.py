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

from ..functions.transformers import as_udf, key_col
from ..operators.keymap import apply_key_mapping, build_key_mapping
from ..operators.subset import FkEdge, subset_tables
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


def run_multi_table_sync(
    spark: SparkSession,
    job: MultiTableJob,
    sources: dict[str, DataFrame],
    write: "callable[[str, DataFrame], None] | None" = None,
) -> dict[str, DataFrame]:
    """Plan + execute: subset along FK edges, order by the DAG, apply
    per-table transforms, rewrite FKs through parent key mappings.
    Returns the synced frames (and writes each via `write` if given).
    """
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
    return out
