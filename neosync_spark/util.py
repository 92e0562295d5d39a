"""Deterministic vectorized hashing shared by synth + transformers.

A splitmix64-style mixer over numpy uint64 — every "random" choice in
the engine is a pure function of (seed, key material), so task retries,
speculative execution and re-partitioning can never change an output
byte (the determinism contract of the reference's PCG-seeded rng,
/root/reference/worker/pkg/rng/rng.go:24-31, made value-keyed instead
of stream-keyed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_FNV = np.uint64(0x100000001B3)


def mix64(*parts: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 over the combined parts (uint64 wraparound)."""
    with np.errstate(over="ignore"):
        acc = np.uint64(0)
        for p in parts:
            arr = np.asarray(p, dtype=np.uint64)
            acc = (acc + arr) * _FNV + _GOLDEN
        z = acc + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def u01(h: np.ndarray) -> np.ndarray:
    """uint64 hash → float64 uniform in [0, 1)."""
    return (np.asarray(h, dtype=np.uint64) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )


def hash_series(s: pd.Series) -> np.ndarray:
    """Deterministic (cross-process) uint64 hash of a pandas series."""
    return pd.util.hash_pandas_object(s.fillna("\x00<null>"), index=False).to_numpy(
        dtype=np.uint64
    )


def round_half_up(col, scale: int = 4):
    """Explicit HALF_UP rounding as a Spark Column expression.

    Engine-portable: ``floor(x * 10^s + 0.5) / 10^s`` evaluates
    identically in Spark and DuckDB, unlike round(), whose tie behavior
    differs (Spark HALF_UP vs DuckDB half-even) — and small-integer
    ratios (e.g. 3/32 = 0.09375) hit exact ties often.
    """
    from pyspark.sql import functions as F

    m = float(10**scale)
    return F.floor(col * m + F.lit(0.5)) / m


def sql_round_half_up(expr: str, scale: int = 4) -> str:
    """The same rounding as ANSI SQL text (for DuckDB oracles)."""
    m = 10**scale
    return f"floor(({expr}) * {m} + 0.5) / {m}"


def str_seed(s: str) -> int:
    """Deterministic uint64 seed from a python string (label hashing)."""
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for ch in s.encode("utf-8"):
            h = (h ^ np.uint64(ch)) * _FNV
    return int(h)


def literal_frame(spark, rows, schema, max_literal: int = 1024):
    """Small local relation as a pure-JVM literal plan.

    ``createDataFrame``-from-list plans a Python-serialized local RDD
    whose scan runs through a Python worker at execution time — the
    FIRST such scan in a session forks the pyspark daemon and imports
    the worker runtime inside whatever task consumes the frame
    (seconds of wall-clock blocked on a 16-row leaf; measured in the
    stats_sync write stage). ``range(1) + explode(array(struct(...)))``
    expresses the same rows as Catalyst literals: whole-stage codegen,
    no Python anywhere, single-partition by construction.

    ``schema`` is a DDL string or StructType. Rows past ``max_literal``
    fall back to ``createDataFrame`` — a huge literal array trades the
    Python worker for an oversized plan tree, the worse deal. Values a
    Spark literal can't carry (rare — e.g. Decimal edge cases) also
    fall back.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    fields = schema.fields
    rows = list(rows)
    if not rows:
        # limit(0), not range(0): OptimizeLimitZero folds this to an
        # empty LocalRelation, which PropagateEmptyRelation then
        # collapses out of any join/union above it — a Range(0,0) leaf
        # is not provably empty to Catalyst and would leave real
        # (nested-loop, for crossJoins) join operators in the plan
        return (
            spark.range(1)
            .select(
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in fields
                ]
            )
            .limit(0)
        )
    if len(rows) > max_literal:
        return spark.createDataFrame(rows, schema)

    def _lit(v, f):
        return (F.lit(v) if v is not None else F.lit(None)).cast(
            f.dataType
        ).alias(f.name)

    try:
        structs = [
            F.struct(*[_lit(v, f) for v, f in zip(r, fields)]) for r in rows
        ]
    except (TypeError, ValueError):
        return spark.createDataFrame(rows, schema)
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_s"))
        .select("_s.*")
    )
