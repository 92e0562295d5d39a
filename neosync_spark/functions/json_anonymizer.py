"""Free-form JSON anonymization — the AnonymizeSingle/Many analog.

The reference compiles a gojq program embedding transformer functions
and runs it per document (/root/reference/internal/json-anonymizer/
json-anonymizer.go:215-236 buildJqQuery, :336-383 AnonymizeJSONObjects),
with type-based default transformers + skip paths (:238-298).

Two Spark-first paths:

* ``anonymize_json_field`` — schema-known: from_json → transform struct
  fields with JVM masking expressions → to_json. Zero Python; use when
  the JSON shape is declared (e.g. the transcript `tool` column).
* ``anonymize_json_udf`` — schemaless: a vectorized pandas UDF walking
  each document, applying a {dot.path: TransformFn} mapping plus
  optional type-based defaults with skip-paths — jq paths become dot
  paths. The per-row Python is confined to one Arrow batch pass.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .transformers import TransformFn


def anonymize_json_field(
    col: Column | str,
    schema: T.StructType,
    field_exprs: dict[str, Column | Callable[[Column], Column]],
) -> Column:
    """Schema-known JSON anonymization, all JVM-side.

    ``field_exprs`` maps top-level field names to replacements: either a
    ready Column expression, or a callable that receives the parsed
    field Column (``lambda f: F.sha2(f, 256)``) — use the callable form
    to transform the field's own value.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, schema)
    rebuilt = []
    for f_ in schema.fields:
        if f_.name in field_exprs:
            e = field_exprs[f_.name]
            if callable(e) and not isinstance(e, Column):
                e = e(parsed.getField(f_.name))
            rebuilt.append(e.alias(f_.name))
        else:
            rebuilt.append(parsed.getField(f_.name).alias(f_.name))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.to_json(F.struct(*rebuilt))
    )


def _set_path(doc: dict, path: list[str], value) -> None:
    cur = doc
    for p in path[:-1]:
        if not isinstance(cur, dict) or p not in cur:
            return
        cur = cur[p]
    if isinstance(cur, dict) and path[-1] in cur:
        cur[path[-1]] = value


def _get_path(doc: dict, path: list[str]):
    cur = doc
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return None
        cur = cur[p]
    return cur


def anonymize_json_udf(
    mapping: dict[str, TransformFn],
    default_string: TransformFn | None = None,
    skip_paths: tuple[str, ...] = (),
) -> Callable[[pd.Series, pd.Series], pd.Series]:
    """Schemaless JSON anonymizer as a (values, keys) pandas function.

    ``mapping``: dot-path → transformer (applied where the path exists);
    ``default_string``: optional type-based default applied to every
    other string leaf (reference applyDefaultTransformers), except
    ``skip_paths``.
    """
    compiled = {tuple(p.lstrip("$.").split(".")): fn for p, fn in mapping.items()}
    skips = {tuple(p.lstrip("$.").split(".")) for p in skip_paths}

    def walk_defaults(doc, fn_apply, prefix=()):
        if isinstance(doc, dict):
            for k, v in doc.items():
                path = prefix + (k,)
                if path in skips or path in compiled:
                    continue
                if isinstance(v, str):
                    doc[k] = fn_apply(v, ".".join(path))
                else:
                    walk_defaults(v, fn_apply, path)
        elif isinstance(doc, list):
            for i, v in enumerate(doc):
                if isinstance(v, str):
                    doc[i] = fn_apply(v, ".".join(prefix) + f"[{i}]")
                else:
                    walk_defaults(v, fn_apply, prefix)

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        out = []
        for v, k in zip(values, keys):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(None)
                continue
            try:
                doc = json.loads(v)
            except (json.JSONDecodeError, TypeError):
                out.append(v)  # not JSON: passthrough
                continue
            for path, tfn in compiled.items():
                old = _get_path(doc, list(path))
                if old is not None:
                    new = tfn(
                        pd.Series([old]), pd.Series([f"{k}|{'.'.join(path)}"])
                    ).iloc[0]
                    _set_path(doc, list(path), new)
            if default_string is not None and isinstance(doc, dict):
                walk_defaults(
                    doc,
                    lambda s, p: default_string(
                        pd.Series([s]), pd.Series([f"{k}|{p}"])
                    ).iloc[0],
                )
            out.append(json.dumps(doc, separators=(",", ":")))
        return pd.Series(out, index=values.index, dtype=object)

    return fn
