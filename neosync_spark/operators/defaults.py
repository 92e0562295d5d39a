"""Type-based default transformers for unmapped columns + identity
scramble.

* ``apply_default_transforms`` — the analog of the reference's
  neosync_default_transformer processor, which anonymizes every column
  NOT covered by an explicit mapping using a per-type default
  (/root/reference/worker/pkg/benthos/default_transform/
  processor.go:26-235).
* ``scramble_identity`` — the analog of the identity block allocator
  (/root/reference/worker/pkg/workflows/tablesync/shared/
  identity-allocator.go:14-126): auto-increment values are replaced by
  fresh unique ids handed out in per-partition blocks; Spark's
  ``monotonically_increasing_id`` IS a per-partition block allocator
  (31-bit partition id << 33 + per-partition counter), so the operator
  is one expression, collision-free across 10^9-row partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import transformers as X
from ..functions.transformers import TransformFn, as_udf, key_col


def default_transformer_for(dtype: T.DataType, seed: int = 42) -> TransformFn | None:
    """Per-type default: strings scramble (class-preserving), integers
    jitter, floats jitter, bools regenerate — mirroring the reference's
    bool/str/number defaults."""
    if isinstance(dtype, T.StringType):
        return X.transform_character_scramble(seed=seed)
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return X.transform_int64(seed=seed)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return X.transform_float64(seed=seed)
    if isinstance(dtype, T.BooleanType):
        return X.generate_bool(seed=seed)
    return None


def apply_default_transforms(
    df: DataFrame,
    mapped_cols: set[str],
    key_cols: list[str],
    seed: int = 42,
    skip_cols: set[str] | None = None,
) -> DataFrame:
    """Anonymize every unmapped, non-key column with its type default."""
    skip = (skip_cols or set()) | set(key_cols) | mapped_cols
    k = key_col(*key_cols)
    out = df
    for f_ in df.schema.fields:
        if f_.name in skip or f_.name.startswith("_"):
            continue
        fn = default_transformer_for(f_.dataType, seed)
        if fn is None:
            continue
        rt = f_.dataType if not isinstance(f_.dataType, (T.IntegerType, T.ShortType)) else T.LongType()
        out = out.withColumn(f_.name, as_udf(fn, rt)(F.col(f_.name), k).cast(f_.dataType))
    return out


def scramble_identity(df: DataFrame, col: str, offset: int = 1) -> DataFrame:
    """Replace an identity/auto-increment column with fresh unique ids
    (never the input value — reference contract). Block-allocated per
    partition, no shuffle, no coordination."""
    return df.withColumn(col, (F.monotonically_increasing_id() + F.lit(offset)).cast("long"))
