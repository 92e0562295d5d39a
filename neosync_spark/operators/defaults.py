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
  fresh unique ids handed out in per-bucket blocks. Unlike
  ``monotonically_increasing_id`` (whose output changes under task
  retry/speculation), the allocation here is a pure function of the
  column's value set: bucket = xxhash64(value) % n_buckets, block
  offsets = cumulative bucket counts (one tiny agg), rank = row_number
  within bucket ordered by value. All ids land ABOVE the current max
  (never the input value — the reference contract,
  identity-allocator.go:88-126) and the window is partitioned by
  bucket, so the sort parallelizes across the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import transformers as X
from ..functions.transformers import TransformFn, as_udf, key_col


def default_transformer_for(dtype: T.DataType, seed: int = 42) -> TransformFn | None:
    """Per-type default: strings scramble (class-preserving), integers
    jitter, floats jitter, bools regenerate, dates jitter days, binary
    rewrites length-preserving, arrays recurse elementwise (N-dim) —
    mirroring the reference's type defaults plus its record-mapper
    exotic-type surface (postgres/mapper.go:33-91, 434+)."""
    if isinstance(dtype, T.StringType):
        return X.transform_character_scramble(seed=seed)
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return X.transform_int64(seed=seed)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return X.transform_float64(seed=seed)
    if isinstance(dtype, T.BooleanType):
        return X.generate_bool(seed=seed)
    if isinstance(dtype, T.BinaryType):
        return X.transform_binary(seed=seed)
    if isinstance(dtype, T.DateType):
        return X.transform_date(seed=seed)
    if isinstance(dtype, T.ArrayType):
        inner = default_transformer_for(dtype.elementType, seed)
        return X.transform_array(inner) if inner is not None else None
    return None


def _is_interval_struct(dtype: T.DataType) -> bool:
    return (
        isinstance(dtype, T.StructType)
        and [f.name for f in dtype.fields] == ["months", "days", "micros"]
    )


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
        if _is_interval_struct(f_.dataType):
            # interval encode (functions/intervals.py, the reference's
            # months/days/micros triple): jitter the micros component,
            # keep the calendar components
            c = F.col(f_.name)
            new_micros = as_udf(X.transform_int64(seed=seed), T.LongType())(
                c.getField("micros"), k
            )
            out = out.withColumn(
                f_.name,
                F.when(c.isNull(), F.lit(None).cast(f_.dataType)).otherwise(
                    F.struct(
                        c.getField("months").alias("months"),
                        c.getField("days").alias("days"),
                        new_micros.cast("long").alias("micros"),
                    )
                ),
            )
            continue
        fn = default_transformer_for(f_.dataType, seed)
        if fn is None:
            continue
        rt = f_.dataType if not isinstance(f_.dataType, (T.IntegerType, T.ShortType)) else T.LongType()
        out = out.withColumn(f_.name, as_udf(fn, rt)(F.col(f_.name), k).cast(f_.dataType))
    return out


def scramble_identity(
    df: DataFrame,
    col: str,
    offset: int = 1,
    n_buckets: int = 256,
    assert_unique: bool = False,
    floor: int | None = None,
) -> DataFrame:
    """Replace an identity/auto-increment column with fresh unique ids.

    Deterministic under any partitioning / task retry (pure function of
    the column's value set), collision-free, and never the input value:
    the allocated ids are exactly ``max(max(col), floor) + offset +
    [1..n]``, block-assigned per hash bucket. Requires ``col`` values to
    be unique (it is an identity column). Two jobs: one tiny per-bucket
    count agg (map-side combined), then a bucket-partitioned window —
    no global sort, no driver-sized collect.

    ``floor`` is the destination-side sequence re-seed (post-table-sync
    identity-reset analog, reference datasync/activities/
    post-table-sync/activity.go): pass
    ``SnapshotTable.identity_high_water(col)`` after a rollback/replay
    so a batch whose own values are small can never allocate into ids
    already held by surviving destination rows.
    """
    from pyspark.sql.window import Window

    b = F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")
    tagged = df.withColumn("_ib", b)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.max(F.col(col)).alias("mx"),
        F.sum(F.col(col).isNull().cast("long")).alias("nnull"),
    ]
    if assert_unique:
        aggs.append(F.countDistinct(F.col(col)).alias("nd"))
    stats = tagged.groupBy("_ib").agg(*aggs).collect()
    # <= n_buckets rows — driver-side block planning, as the reference
    if not stats:
        return df
    if any(int(r["nnull"]) for r in stats):
        raise ValueError(
            f"scramble_identity: column {col!r} contains NULLs — an "
            "identity column must be non-null (NULLs would break the "
            "allocator's uniqueness contract)"
        )
    if assert_unique and any(int(r["nd"]) != int(r["n"]) for r in stats):
        raise ValueError(
            f"scramble_identity: column {col!r} contains duplicate values"
        )
    base = max(int(r["mx"]) for r in stats)
    if floor is not None:
        base = max(base, int(floor))
    base += offset
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(stats, key=lambda r: r["_ib"]):
        offsets[int(r["_ib"])] = acc
        acc += int(r["n"])
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    rank = F.row_number().over(Window.partitionBy("_ib").orderBy(F.col(col)))
    return (
        tagged.withColumn(
            col,
            (F.lit(base) + off_map[F.col("_ib")] + rank).cast("long"),
        )
        .drop("_ib")
    )
