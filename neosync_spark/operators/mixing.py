"""Data-mixture selection: DSIR-style hashed n-gram importance
resampling (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — public method; no reference counterpart, part
of the training-data-pipeline surface).

The estimator is a bag-of-hashed-n-grams language model: unigram+bigram
features hashed into ``n_buckets`` buckets, a smoothed categorical
distribution fit on a (small) TARGET corpus and on the RAW corpus, and
per-document importance ``log w(x) = Σ_grams log p_tgt[b(g)] −
log p_raw[b(g)]``. Selection is Gumbel top-k on the perturbed
log-weights — sampling without replacement from the importance
distribution, deterministic here via md5-seeded noise (retry/replay
stable, like every sampler in this repo).

Scale shape (100 TB raw corpus, 1000 executors):
- the two distributions collapse to ≤ n_buckets rows each (4096
  default) — a broadcast join, never a shuffle of the corpus;
- doc grams explode AFTER a repartition on the doc id (single-input-
  file trap) and aggregate per (doc, bucket) with map-side combine
  before the per-doc score rollup — one key shuffle total;
- everything is JVM built-ins (md5 / conv / aggregate) — zero Python,
  and the md5-derived bucketing replays exactly in DuckDB for the
  oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import _tokens, _word_grams


def _gram_bucket(gram: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: first 8 hex chars of md5 → int
    mod n_buckets (same trick as deterministic_sample/simhash)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")


def hashed_ngram_buckets(
    df: DataFrame,
    content_col: str,
    id_col: str,
    n_buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """One row per n-gram OCCURRENCE: (_id, _b). Lowercased,
    whitespace-tokenized, n ∈ ``ns`` word grams, md5-bucketed."""
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("_id"),
        _tokens(F.lower(F.col(content_col))).alias("_toks"),
    )
    grams = F.concat(*[_word_grams("_toks", n) for n in ns])
    return base.select(
        "_id", F.explode(grams).alias("_g")
    ).select("_id", _gram_bucket(F.col("_g"), n_buckets).alias("_b"))


def _bucket_counts(bucket_rows: DataFrame, name: str) -> DataFrame:
    return bucket_rows.groupBy("_b").agg(F.count(F.lit(1)).alias(name))


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    content_col: str,
    id_col: str,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight.

    Returns ``(id_col, n_grams, log_importance)`` where
    ``log_importance = Σ_g [ log((c_tgt[b]+α)/(N_tgt+α·B)) −
    log((c_raw[b]+α)/(N_raw+α·B)) ]`` (Laplace-α smoothing, so buckets
    unseen in the target still score via the floor). Docs with no grams
    score 0.

    The returned DataFrame keeps the per-(doc,bucket) aggregate and the
    target count table cached (they back both the totals and the score
    join); long-running drivers scoring many corpora should unpersist
    via ``spark.catalog.clearCache()`` after materializing.
    """
    raw_b = hashed_ngram_buckets(raw, content_col, id_col, n_buckets, ns)
    tgt_b = hashed_ngram_buckets(target, content_col, id_col, n_buckets, ns)

    # ONE pass over the raw corpus: the per-(doc,bucket) aggregate is
    # both the join input for scoring AND the source of the bucket
    # counts/total (persisted — far smaller than the gram explosion).
    # The target side collapses to its <= n_buckets-row count table
    # before anything else touches it.
    doc_buckets = raw_b.groupBy("_id", "_b").agg(
        F.count(F.lit(1)).alias("_n")
    ).persist()
    raw_counts = doc_buckets.groupBy("_b").agg(F.sum("_n").alias("_c_raw"))
    tgt_counts = _bucket_counts(tgt_b, "_c_tgt").persist()
    # totals are 1-row aggregates over the (persisted) aggregates —
    # never a second scan of the corpus
    n_raw = raw_counts.agg(F.coalesce(F.sum("_c_raw"), F.lit(0))).collect()[0][0]
    n_tgt = tgt_counts.agg(F.coalesce(F.sum("_c_tgt"), F.lit(0))).collect()[0][0]
    b = float(n_buckets)

    # ≤ n_buckets rows after the full-outer merge — always broadcast
    dist = F.broadcast(
        raw_counts.join(tgt_counts, "_b", "full_outer").select(
            "_b",
            (
                F.log(
                    (F.coalesce("_c_tgt", F.lit(0)) + F.lit(alpha))
                    / F.lit(n_tgt + alpha * b)
                )
                - F.log(
                    (F.coalesce("_c_raw", F.lit(0)) + F.lit(alpha))
                    / F.lit(n_raw + alpha * b)
                )
            ).alias("_lr"),
        )
    )

    scores = (
        doc_buckets.join(dist, "_b")
        .groupBy("_id")
        .agg(
            F.sum("_n").alias("n_grams"),
            F.sum(F.col("_n") * F.col("_lr")).alias("_li"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("_id"))
        .join(scores, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("_li", F.lit(0.0)).alias("log_importance"),
        )
    )


def gumbel_key(id_col: str, seed: int = 0) -> Column:
    """Deterministic standard-Gumbel noise keyed by (seed, id):
    u = (md5-bucket + 0.5)/2^32 ∈ (0,1), g = −ln(−ln u). A pure
    function of the id — stable under retry and repartition."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col))), 1, 8),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    return -F.log(-F.log(u))


def dsir_resample(
    scored: DataFrame,
    id_col: str,
    k: int,
    seed: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k selection = sampling k docs WITHOUT replacement
    with probability ∝ exp(log_importance/temperature) (the standard
    Gumbel-max coupling DSIR uses). Adds ``gumbel_key`` and
    ``selected``; exactly ``k`` rows have selected=true (ties broken
    by id for determinism). One TakeOrderedAndProject-style global
    top-k — no full sort materialized."""
    keyed = scored.withColumn(
        "gumbel_key",
        F.col("log_importance") / F.lit(temperature) + gumbel_key(id_col, seed),
    ).persist()
    topk = (
        keyed.select(F.col("gumbel_key").alias("_gk"), F.col(id_col).alias("_tid"))
        .orderBy(F.col("_gk").desc(), F.col("_tid"))
        .limit(k)
    )
    # the k-th perturbed key is the selection threshold; the collects
    # are 1-row aggregates over a k-row frame, not a corpus collect
    cg = topk.agg(F.min("_gk")).collect()[0][0]
    if cg is None:
        return keyed.withColumn("selected", F.lit(False))
    ct = topk.filter(F.col("_gk") == cg).agg(F.max("_tid")).collect()[0][0]
    sel = (F.col("gumbel_key") > F.lit(cg)) | (
        (F.col("gumbel_key") == F.lit(cg)) & (F.col(id_col) <= F.lit(ct))
    )
    return keyed.withColumn("selected", sel)


# --------------------------------------------- temperature mixture plan

def temperature_mix_plan(
    docs: DataFrame,
    source_col: str,
    token_count: Column | str,
    budget_tokens: int,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Temperature-scaled source mixing plan — the multilingual /
    multi-source sampling recipe (mC4/mT5-style alpha sampling; public
    method, part of the training-data-pipeline surface): source ``i``
    with ``c_i`` tokens gets mixture weight ``p_i = c_i^alpha / Σ_j
    c_j^alpha``. ``alpha < 1`` upsamples low-resource sources toward
    uniform; ``alpha = 1`` is proportional (no reweighting).

    Per source the plan reports the raw and temperature shares, the
    planned token draw ``round(p_i · budget)`` and the implied epoch
    count over that source, capped at ``max_epochs`` so a tiny source
    isn't repeated into memorization (the freed budget is NOT
    redistributed — matching the published recipe, and keeping every
    row independent of the cap decisions of other rows).

    Scale shape: one hash-agg over the corpus (map-side combine) down
    to ≤ |sources| rows, then two unpartitioned window sums over that
    tiny frame — the corpus is touched exactly once; no driver math.

    Returns ``(source, n_docs, n_tokens, raw_share, temp_share,
    planned_tokens, epochs)`` with shares/epochs rounded to 4 decimals
    (half-up) for cross-engine comparability.
    """
    from ..util import round_half_up

    if not 0.0 < alpha <= 1.0:
        # alpha=0 would give a zero-token source pow(0,0)=1 positive
        # share — a plan that draws from an empty source; >1 is
        # anti-smoothing no published recipe uses
        raise ValueError("temperature_mix_plan: alpha must be in (0, 1]")
    tok = F.col(token_count) if isinstance(token_count, str) else token_count
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    c = F.col("n_tokens").cast("double")
    pw = F.pow(c, F.lit(float(alpha)))
    shared = per.select(
        "source",
        "n_docs",
        "n_tokens",
        (c / F.sum(c).over(w)).alias("_raw"),
        (pw / F.sum(pw).over(w)).alias("_tmp"),
    )
    planned = F.floor(
        F.col("_tmp") * F.lit(float(budget_tokens)) + F.lit(0.5)
    ).cast("long")
    epochs = F.when(
        F.col("n_tokens") > 0,
        F.least(
            planned.cast("double") / F.col("n_tokens").cast("double"),
            F.lit(float(max_epochs)),
        ),
    ).otherwise(F.lit(0.0))  # empty source: nothing to draw (and the
    # bare division would be NULL in Spark but inf in DuckDB)
    return shared.select(
        "source",
        "n_docs",
        "n_tokens",
        round_half_up(F.col("_raw"), 4).alias("raw_share"),
        round_half_up(F.col("_tmp"), 4).alias("temp_share"),
        planned.alias("planned_tokens"),
        round_half_up(epochs, 4).alias("epochs"),
    )
