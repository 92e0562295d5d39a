"""Conversation-level quality analysis over the transcript table — the
payload-specific layer of the training-data pipeline: a corpus of
multi-turn conversations needs structural checks (turn continuity,
role discipline, degenerate repetition) before it becomes training
data, exactly as documents need Gopher/C4 rules.

All pure JVM aggregations — per-conversation hash-aggs with map-side
combine plus one lag window partitioned by conversation (conversation-
local work, bounded by turn count). One shuffle on conv_id total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_quality_flags(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_dup_turn_frac: float = 0.5,
    min_turns: int = 2,
) -> DataFrame:
    """Per-conversation structural quality flags.

    Returns one row per conversation:

    - ``n_turns``, ``n_gaps`` (missing turn indices: jumps in the
      sorted turn sequence), ``contiguous`` (starts at 0, no gaps);
    - ``starts_with_user``, ``alternation_breaks`` (adjacent turns with
      the same role — system turns excluded from the discipline check),
      ``n_roles``;
    - ``dup_turn_frac`` (fraction of turns whose exact text repeats
      inside the conversation — degenerate loops score high),
      ``mean_turn_chars``;
    - ``keep`` = contiguous AND starts_with_user AND
      dup_turn_frac <= ``max_dup_turn_frac`` AND n_turns >= ``min_turns``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("_c").orderBy("_t")
    turns = (
        df.select(
            F.col(conv_col).alias("_c"),
            F.col(turn_col).alias("_t"),
            F.col(role_col).alias("_r"),
            F.col(text_col).alias("_x"),
        )
        .withColumn("_prev_t", F.lag("_t").over(w))
        .withColumn("_prev_r", F.lag("_r").over(w))
    )

    per_turn = turns.select(
        "_c",
        "_t",
        "_r",
        "_x",
        F.when(
            F.col("_prev_t").isNotNull() & (F.col("_t") > F.col("_prev_t") + 1),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("_gap"),
        F.when(
            F.col("_prev_r").isNotNull()
            & (F.col("_r") == F.col("_prev_r"))
            & (F.col("_r") != "system"),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("_break"),
    )

    # exact within-conversation turn repeats: count per (conv, text)
    dup = (
        per_turn.groupBy("_c", "_x")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("_c")
        .agg(
            F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)).alias(
                "_dup_turns"
            )
        )
    )

    agg = per_turn.groupBy("_c").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_gap").alias("n_gaps"),
        F.min("_t").alias("_first"),
        F.sum("_break").alias("alternation_breaks"),
        F.count_distinct("_r").alias("n_roles"),
        F.min_by("_r", "_t").alias("_first_role"),
        (
            F.floor(F.avg(F.length("_x")) * 100 + F.lit(0.5)) / 100
        ).alias("mean_turn_chars"),
    )

    out = agg.join(dup, "_c", "left").select(
        F.col("_c").alias(conv_col),
        "n_turns",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        ((F.col("_first") == 0) & (F.col("n_gaps") == 0)).alias("contiguous"),
        (F.col("_first_role") == "user").alias("starts_with_user"),
        F.col("alternation_breaks").cast("long").alias("alternation_breaks"),
        F.col("n_roles").cast("long").alias("n_roles"),
        (
            F.floor(
                F.coalesce(F.col("_dup_turns"), F.lit(0))
                / F.col("n_turns")
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("dup_turn_frac"),
        "mean_turn_chars",
    )
    return out.withColumn(
        "keep",
        F.col("contiguous")
        & F.col("starts_with_user")
        & (F.col("dup_turn_frac") <= max_dup_turn_frac)
        & (F.col("n_turns") >= min_turns),
    )
