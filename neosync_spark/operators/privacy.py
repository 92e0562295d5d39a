"""Re-identification audits — does the anonymized output actually
protect identities?

The reference transforms columns but ships no way to VERIFY the result
against the standard re-identification models; for an anonymization
engine that audit is the acceptance test. Two classical measures, each
ONE hash-aggregate over the quasi-identifier tuple (map-side combined,
scales with the cluster; no window, no join):

- k-anonymity (Sweeney 2002): every row's quasi-identifier combination
  must be shared by >= k rows. ``k_anonymity_report`` returns the
  equivalence-class census: class count, min/median class size, rows
  in classes below k (the re-identifiable tail) and the verdict.
- l-diversity (Machanavajjhala et al. 2007): within each equivalence
  class the SENSITIVE attribute must take >= l distinct values
  (k-anonymity alone fails under homogeneity: a class of 50 rows that
  all share one diagnosis re-identifies the attribute, not the row).

Remediation is generalization — coarsen quasi-identifiers until
classes merge; see the ``transform_generalize_*`` transformers in
``functions.transformers`` (numeric banding, date truncation, string
prefix). The canonical loop: report → generalize the offending column
→ report again (oracled end-to-end in ``privacy_generalize_audit``).

NULL handling: NULL is a VALUE for grouping (SQL GROUP BY semantics) —
a lone row with NULL zip is exactly as re-identifiable as a lone row
with zip 99999.

No reference counterpart file; public literature only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One row: the k-anonymity census of ``df`` over ``quasi_cols``.

    Columns: quasi (the audited column list), k, n_rows, n_classes,
    min_class_size, rows_below_k, pct_below_k (4 decimals, half-up),
    k_satisfied. Two aggregates total: groupBy(quasi) → count, then one
    global fold of the class sizes."""
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    below = F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(F.lit(0)))
    return classes.agg(
        F.lit(",".join(quasi_cols)).alias("quasi"),
        F.lit(int(k)).alias("k"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("min_class_size"),
        below.cast("long").alias("rows_below_k"),
        (
            F.floor(below * 10000.0 / F.sum("_n") + F.lit(0.5)) / 10000.0
        ).alias("pct_below_k"),
        (F.min("_n") >= k).alias("k_satisfied"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,  # noqa: E741 — the literature's name
) -> DataFrame:
    """One row: distinct-l-diversity census of ``sensitive_col`` within
    the quasi-identifier classes. Columns: quasi, sensitive, l, n_rows,
    n_classes, min_diversity, classes_below_l, rows_below_l,
    l_satisfied. Distinct counts are exact per class (two-phase
    hash agg)."""
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(F.col(sensitive_col)).alias("_d"),
    )
    return classes.agg(
        F.lit(",".join(quasi_cols)).alias("quasi"),
        F.lit(sensitive_col).alias("sensitive"),
        F.lit(int(l)).alias("l"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_d").cast("long").alias("min_diversity"),
        F.sum((F.col("_d") < l).cast("long")).cast("long").alias(
            "classes_below_l"
        ),
        F.sum(F.when(F.col("_d") < l, F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_l"),
        (F.min("_d") >= l).alias("l_satisfied"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """One row: t-closeness census (Li, Li & Venkatasubramanian 2007)
    of ``sensitive_col`` within the quasi-identifier classes —
    l-diversity's successor: a class can be "diverse" yet still leak
    when its sensitive-value DISTRIBUTION differs sharply from the
    table's (a class that is 90% one diagnosis against a 10% base rate
    re-identifies probabilistically). Distance is total variation
    (the categorical equal-ground-distance EMD of the paper):
    ``0.5 * Σ_v |p_class(v) - p_global(v)|``, required <= t per class.

    Columns: quasi, sensitive, t, n_rows, n_classes, max_tvd (6
    decimals, half-up), classes_above_t, rows_above_t, t_satisfied.

    Scale shape: one (quasi, sensitive) cell aggregate (map-side
    combined), a class-size window over the cells (quasi-only
    repartition of the TINY cell frame, not the table), the global
    value distribution broadcast in. Values ABSENT from a class never
    materialize: their TVD mass is ``1 - Σ_{v present} p_global(v)``,
    so no domain cross-join exists anywhere.
    """
    from pyspark.sql.window import Window

    cells = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col)
    ).agg(F.count(F.lit(1)).alias("_c"))
    # NULL is a VALUE here like everywhere in this module (an all-NULL
    # class leaks exactly like an all-'flu' one) — the global-
    # distribution join must be null-safe or NULL-sensitive cells
    # silently vanish from the census
    glob = cells.groupBy(
        F.col(sensitive_col).alias("_gs")
    ).agg(F.sum("_c").alias("_g"))
    tot = glob.agg(F.sum("_g").cast("double").alias("_tot"))
    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    enriched = (
        cells.join(
            F.broadcast(glob),
            on=F.col(sensitive_col).eqNullSafe(F.col("_gs")),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("_n", F.sum("_c").over(w))
        .withColumn("_pm", F.col("_g") / F.col("_tot"))
    )
    per_class = enriched.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.first("_n").alias("_n"),
        (
            F.floor(
                0.5
                * (
                    F.sum(
                        F.abs(
                            F.col("_c") / F.col("_n") - F.col("_pm")
                        )
                    )
                    + (F.lit(1.0) - F.sum("_pm"))
                )
                * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("_tvd"),
    )
    return per_class.agg(
        F.lit(",".join(quasi_cols)).alias("quasi"),
        F.lit(sensitive_col).alias("sensitive"),
        F.lit(float(t)).alias("t"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.max("_tvd").alias("max_tvd"),
        F.sum((F.col("_tvd") > t).cast("long")).cast("long").alias(
            "classes_above_t"
        ),
        F.sum(F.when(F.col("_tvd") > t, F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_above_t"),
        (F.max("_tvd") <= t).alias("t_satisfied"),
    )
