"""Cross-table key-consistency mapping.

The reference keeps transformed-PK consistency across tables through a
Redis hash of original→new values written by the PK table's stream and
point-looked-up per row by FK tables
(/root/reference/worker/pkg/benthos/redis/output_hash.go wiring at
/root/reference/internal/benthos/benthos-builder/builders/sql.go:511-539;
lookup processor builders/processors.go:430-480, null-propagating).

Spark-first: the mapping IS a DataFrame, and the per-row point lookup
becomes a broadcast hash join — no external cache, no RPC per row.
When the pseudonym is a pure function (masking.hash_pseudonym) the
mapping join is unnecessary entirely; this operator exists for
transformers whose outputs are NOT recomputable (e.g. seeded random
generators keyed on a different table's rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.transformers import TransformFn, as_udf


def build_key_mapping(
    df: DataFrame, key_col: str, fn: TransformFn, key_seed_col: Column | None = None
) -> DataFrame:
    """Distinct (old_key → new_key) mapping from the primary table."""
    keys = df.select(F.col(key_col).alias("old_key")).distinct()
    seed_col = key_seed_col if key_seed_col is not None else F.col("old_key")
    return keys.withColumn("new_key", as_udf(fn)(F.col("old_key"), seed_col))


def apply_key_mapping(
    child: DataFrame,
    mapping: DataFrame,
    fk_col: str,
    null_on_miss: bool = True,
) -> DataFrame:
    """Rewrite a child table's FK through the mapping via broadcast
    join. ``null_on_miss=True`` mirrors the reference's null-propagating
    lookup (`if this.col == null { deleted() }` semantics softened to
    null)."""
    m = F.broadcast(mapping.withColumnRenamed("old_key", fk_col))
    joined = child.join(m, on=fk_col, how="left")
    new_val = (
        F.col("new_key")
        if null_on_miss
        else F.coalesce(F.col("new_key"), F.col(fk_col))
    )
    return joined.withColumn(fk_col, new_val).drop("new_key")
