"""Unigram language-model scoring — the CCNet-style perplexity quality
filter: fit token counts on a trusted reference slice of the corpus,
score every document by its per-token cross-entropy under that model,
keep the low-perplexity (reference-like) tail. Public method (CCNet,
Wenzek et al. 2020, uses a KenLM 5-gram; the unigram variant here is
the engine-portable core with the same pipeline shape — no external
model artifacts, the "model" is a DataFrame).

Scale shape (100 TB corpus, 1000 executors):
- the count table is one explode + hash-agg over the REFERENCE slice
  (map-side combine), |vocab| rows — joined to the scoring side on the
  token; vocabularies are Zipf-bounded (tens of millions of rows ≪
  corpus), so AQE picks a broadcast for any sane reference and the
  scoring pass stays shuffle-free; pass ``broadcast_model=False`` to
  force a shuffled join for adversarial vocabularies
- doc tokens are pre-aggregated to (doc, token, tf) BEFORE the model
  join, so join input is bounded by distinct-per-doc, not raw length
- smoothing is add-k over V+1 outcomes (the +1 is the unseen bucket),
  so every token has positive mass and the score is total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import round_half_up
from .text import _tokens


def unigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Fit the unigram count table on the reference slice: one row per
    token, ``(token, c)``; whitespace-lowercase tokenization (the same
    ``_tokens`` every corpus operator uses, so model and scorer can
    never disagree on segmentation)."""
    return (
        ref.select(F.explode(_tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def lm_cross_entropy(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score each document under the unigram model with add-k
    smoothing: ``p(t) = (c_t + k) / (T + k·(V+1))`` where T is the
    reference token total, V its vocabulary size, and unseen tokens
    take ``c_t = 0`` mass. Per document:

    - ``cross_entropy`` = mean over tokens of ``−ln p(t)`` (nats)
    - ``bits_per_token`` = ``cross_entropy / ln 2`` — the compression
      view of the same number (perplexity is ``exp(cross_entropy)``;
      deliberately NOT emitted: exp amplifies last-ulp libm
      differences into the rounded decimals, while everything here
      stays O(10) where 4-decimal rounding is engine-stable)
    - ``oov_frac`` = fraction of tokens outside the reference vocab —
      the cheap domain-shift diagnostic that often explains the score.

    Zero-token documents surface with ``n_tokens = 0`` and NULL
    scores (dropping them silently would make the keep-set ambiguous).
    All values rounded to 4 decimals (half-up) for cross-engine
    comparability. Returns ``(id, n_tokens, oov_frac, cross_entropy,
    bits_per_token)``.
    """
    k = float(add_k)
    # model globals collapse to one row and ride along as a literal-
    # free cross join (broadcast either way — it is a single row)
    tot = model.agg(
        F.sum("c").cast("double").alias("_T"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    tf = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(_tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    m = F.broadcast(model) if broadcast_model else model
    joined = (
        tf.join(m, "token", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            "_tf",
            F.col("c").isNull().alias("_oov"),
            # −ln p = ln(T + k(V+1)) − ln(c + k)
            (
                F.log(F.col("_T") + F.lit(k) * (F.col("_V") + F.lit(1.0)))
                - F.log(F.coalesce(F.col("c").cast("double"), F.lit(0.0)) + F.lit(k))
            ).alias("_nll"),
        )
    )
    scored = joined.groupBy("_id").agg(
        F.sum("_tf").cast("long").alias("n_tokens"),
        (
            F.sum(F.when(F.col("_oov"), F.col("_tf")).otherwise(F.lit(0)))
            / F.sum("_tf")
        ).alias("_of"),
        (F.sum(F.col("_nll") * F.col("_tf")) / F.sum("_tf")).alias("_ce"),
    )
    # left join back so zero-token docs keep a row
    base = docs.select(F.col(id_col).alias("_id"))
    return (
        base.join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            round_half_up(F.col("_of"), 4).alias("oov_frac"),
            round_half_up(F.col("_ce"), 4).alias("cross_entropy"),
            round_half_up(F.col("_ce") / F.lit(0.6931471805599453), 4).alias(
                "bits_per_token"
            ),
        )
    )
