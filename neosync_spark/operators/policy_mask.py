"""Read-time column-masking policies — late-binding anonymization.

The engine already anonymizes at WRITE (per-column mappings in the
merge stage, reference analog worker/pkg/benthos processor mappings)
and can re-bake a new policy into the stored bytes
(``lakehouse.transform_backfill``). Both bake ONE policy into the
data. Real deployments also need per-AUDIENCE views of the same
table — the analyst sees hashed ids and redacted text, the export job
sees nulls, the admin sees everything — without N copies of 100 TB.
That is a masked PROJECTION compiled at read time from a policy table
(the Snowflake/Databricks "dynamic masking policy" surface, public
semantics), and it is pure Catalyst: every rule is a built-in Column
expression, whole-stage codegen, zero Python, zero extra shuffle —
masking rides the scan.

Policy rows: ``(col, audience, rule, arg)``. ``audience='*'`` is the
fallback for audiences with no specific row; unmatched columns follow
``default_rule`` (``keep`` for trusted readers, ``null`` for
fail-closed exports). Row-level rules use ``col='*'`` with
``rule='filter'`` and a SQL predicate in ``arg`` (conjunctive).

Rules: keep · null · hash[:len] · mask_email · phone_last4 ·
redact_pii · shape · constant:<v> · truncate:<n> · band:<n> ·
date_trunc:<unit> · filter (row-level).

The policy table is configuration (a handful of rows) — it is read on
the driver; the DATA never leaves the declarative plan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import masking


def _compile_rule(col: str, rule: str, arg: str | None, dtype: str) -> Column:
    c = F.col(col)
    if rule == "keep":
        return c
    if rule == "null":
        return F.lit(None).cast(dtype)
    if rule == "hash":
        length = int(arg) if arg else 12
        return masking.hash_pseudonym(c.cast("string"), salt="pol", length=length)
    if rule == "mask_email":
        return masking.mask_email(c)
    if rule == "phone_last4":
        return masking.mask_phone_keep_last4(c)
    if rule == "redact_pii":
        return masking.redact_pii(c)
    if rule == "shape":
        return masking.shape_mask(c)
    if rule == "constant":
        return F.lit(arg).cast(dtype)
    if rule == "truncate":
        return F.substring(c, 1, int(arg or 8))
    if rule == "band":
        n = int(arg or 10)
        return (F.floor(c / n) * n).cast(dtype)
    if rule == "date_trunc":
        return F.date_trunc(arg or "day", c)
    raise ValueError(f"unknown masking rule {rule!r} for column {col!r}")


def apply_policies(
    df: DataFrame,
    policies: Sequence[Mapping[str, str | None]] | DataFrame,
    audience: str,
    default_rule: str = "keep",
) -> DataFrame:
    """The ``audience``'s view of ``df`` under the policy table.

    ``policies`` rows carry col/audience/rule and optional arg. An
    audience-specific row beats the ``'*'`` fallback; columns with no
    row follow ``default_rule``. Column order and names are preserved
    (downstream readers see the same schema surface; types change only
    where the rule implies it, e.g. ``hash`` of an int is a string).
    """
    if isinstance(policies, DataFrame):
        rows = [r.asDict() for r in policies.collect()]  # config-sized
    else:
        rows = [dict(p) for p in policies]
    for r in rows:
        r.setdefault("arg", None)

    def pick(col: str) -> tuple[str, str | None] | None:
        exact = [r for r in rows if r["col"] == col and r["audience"] == audience]
        star = [r for r in rows if r["col"] == col and r["audience"] == "*"]
        chosen = exact or star
        if not chosen:
            return None
        if len(chosen) > 1:
            raise ValueError(f"conflicting policy rows for column {col!r}")
        return chosen[0]["rule"], chosen[0]["arg"]

    dtypes = dict(df.dtypes)
    out_cols = []
    for col in df.columns:
        p = pick(col)
        rule, arg = p if p else (default_rule, None)
        out_cols.append(_compile_rule(col, rule, arg, dtypes[col]).alias(col))
    out = df.select(*out_cols)

    filters = [
        r["arg"]
        for r in rows
        if r["col"] == "*"
        and r["rule"] == "filter"
        and r["audience"] in (audience, "*")
        and r["arg"]
    ]
    for pred in filters:
        # row-level predicates see the ORIGINAL columns' names but the
        # MASKED values — a reader excluded from a value cannot filter
        # on it to exfiltrate (fail-closed, standard RLS ordering)
        out = out.filter(F.expr(pred))
    return out
