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


def _path_tokens(p: str) -> tuple[str, ...]:
    """'$.users[].contact.email' → ('users', '[]', 'contact', 'email').
    A trailing '[]' on a segment is the gojq array-wildcard analog
    (reference compiles full jq programs, json-anonymizer.go:215-236;
    dot paths + [] wildcards cover the documented mapping surface)."""
    toks: list[str] = []
    for seg in p.lstrip("$.").split("."):
        if seg.endswith("[]"):
            if seg[:-2]:
                toks.append(seg[:-2])
            toks.append("[]")
        elif seg:
            toks.append(seg)
    return tuple(toks)


def _transform_path(node, toks: tuple[str, ...], i: int, apply_one, key: str) -> None:
    """Apply ``apply_one(old_value, key)`` at every location matching
    the token path (wildcards fan out over list elements)."""
    if i >= len(toks):
        return
    t = toks[i]
    last = i == len(toks) - 1
    if t == "[]":
        if isinstance(node, list):
            for j, item in enumerate(node):
                if last:
                    if item is not None:
                        node[j] = apply_one(item, f"{key}[{j}]")
                else:
                    _transform_path(item, toks, i + 1, apply_one, f"{key}[{j}]")
        return
    if isinstance(node, dict) and t in node:
        if last:
            if node[t] is not None:
                node[t] = apply_one(node[t], key)
        else:
            _transform_path(node[t], toks, i + 1, apply_one, key)


def anonymize_json_udf(
    mapping: dict[str, TransformFn],
    default_string: TransformFn | None = None,
    skip_paths: tuple[str, ...] = (),
) -> Callable[[pd.Series, pd.Series], pd.Series]:
    """Schemaless JSON anonymizer as a (values, keys) pandas function.

    ``mapping``: dot-path → transformer (applied where the path exists;
    ``[]`` segments fan out over arrays, e.g. ``$.users[].email``);
    ``default_string``: optional type-based default applied to every
    other string leaf (reference applyDefaultTransformers), except
    ``skip_paths``.
    """
    compiled = {_path_tokens(p): fn for p, fn in mapping.items()}
    skips = {_path_tokens(p) for p in skip_paths}
    # walk_defaults builds list-free paths (list hops keep the prefix),
    # so exclusion matching compares with '[]' tokens dropped
    _mapped_flat = {tuple(t for t in p if t != "[]") for p in compiled}
    _skip_flat = {tuple(t for t in p if t != "[]") for p in skips}

    def walk_defaults(doc, fn_apply, prefix=()):
        if isinstance(doc, dict):
            for k, v in doc.items():
                path = prefix + (k,)
                if path in _skip_flat or path in _mapped_flat:
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
                base_key = f"{k}|{'.'.join(t for t in path if t != '[]')}"
                _transform_path(
                    doc,
                    path,
                    0,
                    lambda old, kk, _t=tfn: _t(
                        pd.Series([old]), pd.Series([kk])
                    ).iloc[0],
                    base_key,
                )
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
