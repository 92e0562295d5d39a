"""PII scan report — the audit/compliance half of the anonymizer: count
recognizer hits per (column, entity) across a table WITHOUT mutating
anything. A data team runs this before deciding which transformers a
sync job needs (the reference jumps straight to transforming; the scan
is the missing "what's in here?" step).

Pure JVM: one pass over the table computing
``size(regexp_extract_all(col, pattern))`` per column×entity (wide
aggregate, map-side combined), melted to long form at the end —
scan cost is one table scan regardless of how many entities are
enabled. CREDIT_CARD candidates are Luhn-validated with a JVM
aggregate lambda (the same checksum the DuckDB oracle replays).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .transformers import (
    PII_CREDIT_CARD_RE,
    PII_DATE_RE,
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    PII_SSN_RE,
)

SCAN_ENTITIES: dict[str, str] = {
    "EMAIL_ADDRESS": PII_EMAIL_RE,
    "PHONE_NUMBER": PII_PHONE_RE,
    "US_SSN": PII_SSN_RE,
    "CREDIT_CARD": PII_CREDIT_CARD_RE,
    "IP_ADDRESS": PII_IP_RE,
    "DATE_TIME": PII_DATE_RE,
}


def luhn_valid_col(x: Column) -> Column:
    """JVM Luhn checksum over the digits of ``x`` (13-19 digits), the
    validation step of Presidio's CreditCardRecognizer — identical
    arithmetic to transformers._luhn_valid and the DuckDB oracle."""
    digits = F.regexp_replace(x, r"\D", "")
    rev = F.split(F.reverse(digits), "")

    def _d(i: Column) -> Column:
        return F.element_at(rev, i).cast("int")

    total = F.aggregate(
        F.sequence(F.lit(1), F.length(digits)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 0,
            F.when(_d(i) * 2 > 9, _d(i) * 2 - 9).otherwise(_d(i) * 2),
        ).otherwise(_d(i)),
    )
    return F.length(digits).between(13, 19) & (total % 10 == 0)


def _hits(col: Column, entity: str, pattern: str) -> Column:
    """Array of validated matches of ``pattern`` in ``col``."""
    matches = F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(pattern), 0)
    if entity == "CREDIT_CARD":
        matches = F.filter(matches, luhn_valid_col)
    return matches


def scan_pii(
    df: DataFrame,
    cols: Sequence[str],
    entities: Sequence[str] | None = None,
) -> DataFrame:
    """Per (column, entity) recognizer hit counts.

    Returns ``(column, entity, n_rows_with_hit, n_hits)`` sorted by
    column then entity — ``n_hits`` counts every match occurrence,
    ``n_rows_with_hit`` the rows containing at least one.
    """
    names = list(SCAN_ENTITIES) if entities is None else list(entities)
    if not names or not cols:
        raise ValueError(
            "scan_pii needs at least one column and one entity "
            "(entities=None scans all)"
        )
    ents = {e: SCAN_ENTITIES[e] for e in names}
    # project each match count ONCE, then aggregate the projected
    # columns — guarantees a single regex (+ Luhn) evaluation per row
    # per entity instead of trusting aggregate-level subexpression
    # elimination with two embedded copies
    proj = df.select(
        *[
            F.size(_hits(F.col(c), e, pat)).alias(f"n|{c}|{e}")
            for c in cols
            for e, pat in ents.items()
        ]
    )
    aggs = []
    for c in cols:
        for e in ents:
            n = F.col(f"n|{c}|{e}")
            aggs.append(F.sum(n).alias(f"h|{c}|{e}"))
            aggs.append(
                F.sum(F.when(n > 0, 1).otherwise(0)).alias(f"r|{c}|{e}")
            )
    wide = proj.agg(*aggs)
    stack_items = ", ".join(
        f"'{c}', '{e}', `r|{c}|{e}`, `h|{c}|{e}`" for c in cols for e in ents
    )
    n_pairs = len(cols) * len(ents)
    return wide.selectExpr(
        f"stack({n_pairs}, {stack_items}) AS "
        "(column, entity, n_rows_with_hit, n_hits)"
    ).orderBy("column", "entity")
