"""Text analysis operators for training-data pipelines — all JVM-side
(built-in functions, whole-stage codegen), designed to stream over a
100 TB documents table with zero Python in the hot path.

* token counting (whitespace + BPE-ish sub-word estimate + GPT-2-style
  pretokenizer count via regexp_extract_all, cross-engine-verified)
* quality scoring (length / punctuation / stopword / alpha ratios)
* language ID (stopword-hit heuristic over a small per-language set)
* document fingerprinting (normalized-content hash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import literal_frame, round_half_up

# tokenization shared with the DuckDB oracle: split on single spaces,
# empty tokens removed
def _tokens(c: Column) -> Column:
    return F.filter(F.split(c, " "), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(_tokens(c))


def subword_token_estimate(col: Column | str, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token estimate: ceil(chars / 4) — the standard serving
    heuristic; exact BPE would be a dictionary-broadcast pandas UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.ceil(F.length(c) / F.lit(chars_per_token)).cast("long")


STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un", "una", "por"],
}


def _stopword_hits(c: Column, words: list[str]) -> Column:
    toks = _tokens(F.lower(c))
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0,1].
    Mirrors the quality heuristics common in large-scale pretraining
    data pipelines (length, alpha ratio, stopword density)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = _tokens(c)
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    stop_hits = _stopword_hits(c, STOPWORDS["en"])
    mean_tok_len = F.when(n_tokens > 0, (n_chars / n_tokens)).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.least(alpha_ratio * F.lit(1.25), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return df.select(
        "*",
        n_chars.cast("long").alias("q_n_chars"),
        n_tokens.cast("long").alias("q_n_tokens"),
        round_half_up(alpha_ratio, 4).alias("q_alpha_ratio"),
        round_half_up(punct_ratio, 4).alias("q_punct_ratio"),
        round_half_up(stop_ratio, 4).alias("q_stopword_ratio"),
        round_half_up(mean_tok_len, 4).alias("q_mean_token_len"),
        round_half_up(score, 4).alias("q_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: argmax over per-language hit
    counts, 'und' (undetermined) when no stopword matches."""
    c = F.col(text_col)
    hit_cols = []
    for lang, words in sorted(STOPWORDS.items()):
        hit_cols.append(_stopword_hits(c, words).alias(f"hits_{lang}"))
    with_hits = df.select("*", *hit_cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    # first language (alphabetical) achieving the max wins ties
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return with_hits.withColumn("lang_pred", pred).drop(
        *[f"hits_{lg}" for lg in langs]
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint over normalized content
    (lowercase, collapsed whitespace) — md5 so it's verifiable in any
    SQL engine; near-dup detection uses minhash/simhash instead."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    return F.md5(norm)


# ----------------------------------------------------------- winnowing

def winnow_fingerprints(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 8,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): k-gram hashes over the normalized text, keep the
    MINIMUM hash of every length-``window`` run — a robust sketch for
    PARTIAL-overlap detection (content moved/edited locally still
    shares most selected fingerprints, unlike a whole-document hash).

    All JVM built-ins: positions explode → substring k-grams →
    md5-derived 60-bit hashes (engine-portable, same trick as simhash)
    → sliding-window min (window partitioned per doc, so docs
    parallelize across the cluster) → distinct. Returns (id, fp)."""
    from pyspark.sql.window import Window

    c = F.col(content_col)
    norm = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    n_grams = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(0))
    # guard: sequence(1, 0) in Spark is DESCENDING [1, 0] — short docs
    # must produce an empty position list, not two bogus positions
    positions = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    # a documents table often arrives as few/small files (one input
    # task) while the k-gram fan-out is ~|text| rows per doc — spread
    # docs across the cluster BEFORE the heavy projection
    par = df.sparkSession.sparkContext.defaultParallelism
    pos = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("_id"),
        norm.alias("_n"),
        F.explode(positions).alias("_i"),
    )
    hashed = pos.select(
        "_id",
        "_i",
        F.conv(F.substring(F.md5(F.expr(f"substring(_n, _i, {k})")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    w = (
        Window.partitionBy("_id")
        .orderBy("_i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        hashed.select("_id", F.min("_h").over(w).alias("fp"))
        .distinct()
        .select(F.col("_id").alias(id_col), "fp")
    )


def duplicate_spans(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 20,
    max_df: int | None = None,
) -> DataFrame:
    """Exact duplicated-span extraction — the distributed analog of the
    suffix-array exact-substring dedup of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed over word windows: every ``k``-token window whose
    exact text occurs more than once in the corpus (any doc, any
    position, including self-repeats) marks its tokens as duplicated;
    per document, overlapping/adjacent duplicated windows merge into
    MAXIMAL spans — the removable regions.

    Returns ``(id, span_start, span_end, n_dup_windows, span_md5)``
    with token-index bounds [span_start, span_end) and an md5 of the
    span's token text (cross-engine verifiable).

    Scale shape: docs repartitioned before the window fan-out; one
    hash-agg counts window occurrences corpus-wide (map-side combine —
    a window repeated 10^6 times collapses per task before the
    shuffle); one join window→count (no pair join anywhere, unlike the
    O(pairs) fingerprint-overlap path); span merging is gaps-and-islands
    per doc (lag + running max over a per-doc window — doc-local work,
    bounded by doc length). ``max_df`` optionally drops boilerplate
    windows above a document-frequency cap, like the stop-print filter.
    """
    from pyspark.sql.window import Window

    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("_id"), _tokens(F.lower(F.col(content_col))).alias("_tk")
    )
    n_win = F.greatest(F.size("_tk") - F.lit(k - 1), F.lit(0))
    positions = F.when(n_win >= 1, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<int>")
    )
    wins = base.select(
        "_id",
        "_tk",
        F.explode(positions).alias("_p"),
    ).select(
        "_id",
        "_p",
        F.md5(F.concat_ws(" ", F.slice("_tk", F.col("_p") + 1, k))).alias("_wh"),
    )

    counts = wins.groupBy("_wh").agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct("_id").alias("_df"),
    )
    dup = counts.filter(F.col("_n") >= 2)
    if max_df is not None:
        dup = dup.filter(F.col("_df") <= max_df)

    hits = wins.join(dup.select("_wh"), "_wh").select("_id", "_p")

    # gaps-and-islands: a new span starts when this window no longer
    # overlaps/touches the previous one (gap > k)
    w_ord = Window.partitionBy("_id").orderBy("_p")
    isl = (
        hits.withColumn("_prev", F.lag("_p").over(w_ord))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("_p") > F.col("_prev") + k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_isl", F.sum("_new").over(w_ord))
    )
    spans = isl.groupBy("_id", "_isl").agg(
        F.min("_p").alias("span_start"),
        (F.max("_p") + F.lit(k)).alias("span_end"),
        F.count(F.lit(1)).alias("n_dup_windows"),
    )
    return (
        spans.join(base, "_id")
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            "n_dup_windows",
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        "_tk",
                        F.col("span_start") + 1,
                        F.col("span_end") - F.col("span_start"),
                    ),
                )
            ).alias("span_md5"),
        )
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    min_shared: int = 5,
    k: int = 8,
    window: int = 8,
    max_df: int = 50,
) -> DataFrame:
    """Partial-duplicate pairs by shared winnowing fingerprints: join on
    the fingerprint (candidates ∝ collisions, never n²), count distinct
    shared prints per pair, keep pairs sharing ≥ ``min_shared``.

    ``max_df`` drops ubiquitous fingerprints (document frequency above
    the cap) BEFORE the self-join — the stop-print filter. A template
    phrase shared by d documents would alone contribute d·(d-1)/2 join
    rows (the n² trap in skew form) while carrying no dedup signal;
    capping document frequency bounds per-fingerprint fan-out, exactly
    like dropping stopwords before an inverted-index join."""
    fps = winnow_fingerprints(df, content_col, id_col, k, window)
    from pyspark.sql.window import Window

    rare = fps.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).filter(F.col("_df") <= max_df).drop("_df")
    # the self-join would otherwise evaluate the whole winnow pipeline
    # twice (no exchange reuse across the aliased sides — measured 6
    # exchanges, 0 reused); persist the small (id, fp) set instead.
    # Lifecycle: the cache lives until the SparkSession ends (same
    # caller-owned pattern as minhash_dedup_pairs' shingles) — a
    # long-lived service should spark.catalog.clearCache() between
    # corpus runs.
    rare = rare.persist()
    l, r = rare.alias("l"), rare.alias("r")
    idl, idr = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    return (
        l.join(r, on=[F.col("l.fp") == F.col("r.fp"), idl < idr])
        .groupBy(idl.alias("id_a"), idr.alias("id_b"))
        .agg(F.countDistinct(F.col("l.fp")).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


# ------------------------------------------------- context-window packing

def chunk_text_overlap(
    df: DataFrame,
    content_col: str,
    id_col: str,
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the RAG /
    embedding-prep shape (vs `pack_token_chunks`, which packs the whole
    corpus into one global token stream).

    Each document is cut into windows of ``size`` characters advancing
    by ``size - overlap``; consecutive chunks share ``overlap`` chars so
    no span is ever split across a boundary without context. Returns
    (id, chunk_idx, chunk_start, chunk_text); a document shorter than
    one window yields exactly one chunk. Deterministic chunk identity =
    (id, chunk_idx) — stable across re-runs for incremental embedding.

    Scale shape: zero shuffles — `sequence` + `explode` + `substr` are
    all whole-stage-codegen JVM expressions evaluated per input row, so
    this is a pure map over the corpus scan (fan-out bounded by
    doc_len/stride). No Python, no window, no join.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    ln = F.length(F.col(content_col))
    # n_chunks = 1 + ceil(max(len-size,0) / stride), in integer math
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(ln - F.lit(size), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        )
    ).cast("long")
    start = F.col("chunk_idx") * F.lit(stride)
    return (
        df.filter(F.col(content_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(content_col).alias("_txt"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            start.alias("chunk_start"),
            F.col("_txt").substr(
                (start + 1).cast("int"), F.lit(size)
            ).alias("chunk_text"),
        )
    )


def pack_token_chunks(
    df: DataFrame,
    content_col: str,
    id_col: str,
    budget: int = 512,
    partitions: int | None = None,
) -> DataFrame:
    """GPT-style context-window packing: the corpus is one token stream
    in ascending id order, cut into fixed-``budget`` chunks; a document
    appears once per chunk its token range overlaps. Returns
    (id, chunk_id, doc_tok_start, doc_tok_end) where the start/end are
    the DOC-RELATIVE token slice landing in that chunk (end exclusive).

    Scale shape: the global running offset is a DISTRIBUTED prefix sum
    — ids are sharded by DRIVER-FROZEN quantile bounds (a pure function
    of the id value: stable across jobs, retries and AQE re-planning,
    unlike spark_partition_id, which can differ between the two
    executions of a range exchange and silently drop rows), shard token
    sums come to the driver (O(shards) rows), prefix offsets rejoin as
    a literal map, local cumsum via a per-shard window. No single-task
    global window, ever.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    toks = df.select(
        F.col(id_col).alias("_id"), token_count(content_col).alias("_nt")
    ).filter(F.col("_nt") > 0)
    out_schema = (
        f"{id_col} long, chunk_id long, doc_tok_start long, doc_tok_end long"
    )
    bounds = sorted(
        set(
            toks.stat.approxQuantile(
                "_id", [i / n for i in range(1, n)], 0.001
            )
        )
    )
    # shard = number of frozen cutpoints <= id: ascending in id, so
    # shard order IS global id order
    shard = F.lit(0)
    for q in bounds:
        shard = shard + (F.col("_id") > F.lit(q)).cast("int")
    parts = toks.withColumn("_sh", shard)
    psums = parts.groupBy("_sh").agg(F.sum("_nt").alias("s")).collect()
    if not psums:
        return literal_frame(spark, [], out_schema)
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(psums, key=lambda r: r["_sh"]):
        offsets[int(r["_sh"])] = acc
        acc += int(r["s"])
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_sh").orderBy("_id")
    b = F.lit(budget)
    local = parts.withColumn(
        "_start", off_map[F.col("_sh")] + F.sum("_nt").over(w) - F.col("_nt")
    )
    spanned = local.select(
        "_id",
        "_nt",
        "_start",
        F.explode(
            F.sequence(
                F.floor(F.col("_start") / b),
                F.floor((F.col("_start") + F.col("_nt") - 1) / b),
            )
        ).alias("chunk_id"),
    )
    chunk_lo = F.col("chunk_id") * b
    return spanned.select(
        F.col("_id").alias(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.greatest(chunk_lo - F.col("_start"), F.lit(0))
        .cast("long")
        .alias("doc_tok_start"),
        (
            F.least(chunk_lo + b, F.col("_start") + F.col("_nt"))
            - F.col("_start")
        )
        .cast("long")
        .alias("doc_tok_end"),
    )


# ------------------------------------------------ Gopher-style repetition/
# quality filter rules (Rae et al. 2021 §A1.1 heuristics, adapted)

def gopher_quality_flags(
    df: DataFrame,
    content_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher-rule booleans + the composite keep flag —
    the standard pretraining-corpus quality gate, all JVM built-ins:

    * word count within [min_words, max_words]
    * mean word length within [min, max]
    * symbol-to-word ratio (``#`` and ``...``) below threshold
    * fraction of words with an alphabetic character above threshold
    * at least ``min_stopword_hits`` English stopwords

    Returns (id, n_words, ok_words, ok_mean_len, ok_symbols, ok_alpha,
    ok_stopwords, keep). Boolean outputs keep the oracle exact — no
    float formatting crosses engines.
    """
    c = F.col(content_col)
    toks = _tokens(c)
    n_words = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    mean_len = total_len / n_words
    n_sym = F.size(F.filter(toks, lambda t: t.contains("#"))) + F.size(
        F.split(c, r"\.\.\.")
    ) - 1
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_hits = _stopword_hits(c, STOPWORDS["en"])
    # empty docs fail every ratio rule (lazy CASE WHEN branches: under
    # ANSI mode an eager x/n_words would raise DIVIDE_BY_ZERO)
    nz = n_words > 0
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = F.when(
        nz,
        (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len),
    ).otherwise(F.lit(False))
    ok_sym = F.when(nz, (n_sym / n_words) <= max_symbol_ratio).otherwise(
        F.lit(False)
    )
    ok_alpha = F.when(
        nz, (alpha_words / n_words) >= min_alpha_word_ratio
    ).otherwise(F.lit(False))
    ok_stop = stop_hits >= min_stopword_hits
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        ok_words.alias("ok_words"),
        ok_mean.alias("ok_mean_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mean & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )


# ----------------------------------------------- deterministic sampling

def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
    salt: str = "ns",
) -> DataFrame:
    """Hash-keyed Bernoulli sample: keep a row iff
    md5(salt|seed|id) mod 10^6 < fraction·10^6.

    Unlike ``df.sample`` (partition-seeded RNG: resample under retry /
    repartition), membership is a pure function of the id — stable
    across runs, partitionings and engines (an independent SQL engine
    reproduces the exact row set), and a join of two samples with the
    same seed is consistent. The standard curation primitive for
    held-out splits at corpus scale.
    """
    c = F.concat(
        F.lit(f"{salt}|{seed}|"), F.col(id_col).cast("string")
    )
    bucket = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % 1_000_000
    return df.filter(bucket < int(fraction * 1_000_000))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance sources or
    languages in a pretraining mix): each stratum keeps its own
    fraction, same hash-keyed membership as
    :func:`deterministic_sample`. Strata missing from ``fractions``
    keep ``default_fraction``. One scan, zero shuffles."""
    c = F.concat(F.lit(f"ns|{seed}|"), F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % 1_000_000
    thr = F.lit(int(default_fraction * 1_000_000))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(frac * 1_000_000))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def _word_grams(toks: Column | str, n: int) -> Column:
    """All (non-distinct) word n-grams of a token array — empty array
    below n tokens."""
    tc = F.col(toks) if isinstance(toks, str) else toks
    return F.when(
        F.size(tc) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tc, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def gopher_repetition_flags(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_dup_line_frac: float = 0.30,
    max_top_2gram_frac: float = 0.20,
    max_top_3gram_frac: float = 0.18,
    max_dup_5gram_char_frac: float = 0.15,
) -> DataFrame:
    """The repetition half of the Gopher filters (Rae et al. 2021
    §A1.1): fraction of a document's lines that are duplicates of
    another line, the share of {2,3}-grams taken by the most frequent
    one, and the fraction of characters inside duplicated 5-grams.
    Returns (id, n_lines, dup_line_frac, top_2gram_frac,
    top_3gram_frac, dup_5gram_char_frac, ok_*, keep) with fractions
    rounded half-up to 4 places (the cross-engine-stable projection
    used throughout).

    The dup-n-gram char fraction counts sum((count−1) · len(gram))
    over duplicated grams against total text chars — the
    non-overlap-deduplicated variant (interval-union coverage is not
    engine-portable; repeated text scores high under either
    definition, clamped to 1).

    Plan shape: docs repartitioned BEFORE the line/gram fan-outs
    (single-input-task trap), per-(doc, line) and per-(doc, gram)
    hash-aggs with map-side combine, per-doc rollup, broadcastable
    joins back to the doc spine. No Python anywhere.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("_id"), F.col(content_col).alias("_t")
    )

    lines = base.select(
        "_id",
        F.explode(
            F.filter(F.split("_t", "\n"), lambda ln: F.trim(ln) != "")
        ).alias("_ln"),
    )
    line_stats = (
        lines.groupBy("_id", "_ln")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_lines"),
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)).alias("_dup"),
        )
    )

    toks = base.select(
        "_id", _tokens(F.lower(F.col("_t"))).alias("_toks")
    )
    # ONE explode over the tagged union of all three gram families: the
    # token array crosses a single projection boundary (no persist —
    # a cached frame here would leak for the session lifetime — and no
    # recompute), then one (id, n, gram) count shuffle and one per-doc
    # rollup with conditional aggregates
    def _tag(n: int):
        # NB: a (g, n=n) default-arg lambda would become transform's
        # TWO-argument form, where the second parameter is the element
        # INDEX — a closure keeps n a Python constant
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    tagged = toks.select(
        "_id",
        F.explode(
            F.concat(
                *[
                    F.transform(_word_grams("_toks", n), _tag(n))
                    for n in (2, 3, 5)
                ]
            )
        ).alias("_x"),
    ).select("_id", F.col("_x.n").alias("_n"), F.col("_x.g").alias("_g"))
    counts = tagged.groupBy("_id", "_n", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    gram_stats = counts.groupBy("_id").agg(
        F.sum(F.when(F.col("_n") == 2, F.col("_c"))).alias("_ng2"),
        F.max(F.when(F.col("_n") == 2, F.col("_c"))).alias("_top2"),
        F.sum(F.when(F.col("_n") == 3, F.col("_c"))).alias("_ng3"),
        F.max(F.when(F.col("_n") == 3, F.col("_c"))).alias("_top3"),
        F.sum(
            F.when(
                (F.col("_n") == 5) & (F.col("_c") > 1),
                (F.col("_c") - 1) * F.length("_g"),
            )
        ).alias("_dup5_chars"),
    )

    spine = base.select("_id", F.length("_t").alias("_chars"))
    out = (
        spine.join(line_stats, "_id", "left")
        .join(gram_stats, "_id", "left")
    )
    dup_frac = F.when(
        F.col("n_lines") > 0, F.col("_dup") / F.col("n_lines")
    ).otherwise(F.lit(0.0))
    top2_frac = F.when(
        F.col("_ng2") > 0, F.col("_top2") / F.col("_ng2")
    ).otherwise(F.lit(0.0))
    top3_frac = F.when(
        F.col("_ng3") > 0, F.col("_top3") / F.col("_ng3")
    ).otherwise(F.lit(0.0))
    dup5_frac = F.when(
        F.col("_chars") > 0,
        F.least(
            F.coalesce(F.col("_dup5_chars"), F.lit(0)) / F.col("_chars"),
            F.lit(1.0),
        ),
    ).otherwise(F.lit(0.0))
    ok_dup = dup_frac <= max_dup_line_frac
    ok_top2 = top2_frac <= max_top_2gram_frac
    ok_top3 = top3_frac <= max_top_3gram_frac
    ok_dup5 = dup5_frac <= max_dup_5gram_char_frac
    return out.select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
        round_half_up(dup_frac, 4).alias("dup_line_frac"),
        round_half_up(top2_frac, 4).alias("top_2gram_frac"),
        round_half_up(top3_frac, 4).alias("top_3gram_frac"),
        round_half_up(dup5_frac, 4).alias("dup_5gram_char_frac"),
        ok_dup.alias("ok_dup_lines"),
        ok_top2.alias("ok_top_2gram"),
        ok_top3.alias("ok_top_3gram"),
        ok_dup5.alias("ok_dup_5gram"),
        (ok_dup & ok_top2 & ok_top3 & ok_dup5).alias("keep"),
    )


# GPT-2-style pretokenizer, RE2/Java-compatible variant: contractions,
# optionally-space-prefixed letter runs / digit runs / symbol runs,
# then whitespace runs. (The original's `\s+(?!\S)` lookahead is not
# RE2-expressible; DuckDB shares this pattern verbatim, so the count is
# verifiable cross-engine. Whitespace is an EXPLICIT class: Java's \s
# includes \x0B, RE2's does not — the shorthand would diverge on
# vertical tabs.)
_WS = r" \t\n\x0B\f\r"
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^A-Za-z0-9{_WS}']+|[{_WS}]+"
)


def bpe_pretoken_count(col: Column | str) -> Column:
    """Count of GPT-2-style pretokens — the units a BPE tokenizer would
    merge within; a far better LLM-token estimate than whitespace words
    for code/punctuation-heavy text. Pure JVM regexp_extract_all."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), 0))


def ngram_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    content_col: str,
    id_col: str,
    n: int = 8,
    broadcast_eval: bool | None = None,
) -> DataFrame:
    """Benchmark decontamination by word n-gram collision (the
    GPT-3/PaLM recipe: a training doc is contaminated if it shares any
    length-``n`` word gram with an evaluation document).

    Returns one row per train doc: ``(id, n_overlap_grams,
    contaminated)`` where ``n_overlap_grams`` counts DISTINCT eval
    grams hit.

    Scale shape: the eval side collapses to its distinct gram set
    first (benchmark suites are tiny next to a 100 TB corpus), the
    train side explodes grams AFTER a repartition (documents tables
    often arrive as one file = one input task), and the collision join
    runs eval-side-broadcast when ``broadcast_eval`` is True — with
    ``None`` the sizes are left to Catalyst/AQE, mirroring
    `semijoin_subset`'s guard; a 10^9-gram eval set would OOM a forced
    broadcast. Gram-hit counting aggregates map-side before the final
    per-doc count."""
    from .similarity import shingle_docs

    eval_grams = (
        shingle_docs(eval_df, content_col, id_col, n)
        .select(F.explode("_sh").alias("_g"))
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    train_grams = shingle_docs(train_df, content_col, id_col, n).select(
        "_id", F.explode("_sh").alias("_g")
    )
    hits = (
        train_grams.join(eval_grams, "_g")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_grams"))
    )
    return (
        train_df.select(F.col(id_col).alias("_id"))
        .join(hits, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_overlap_grams", F.lit(0)).alias("n_overlap_grams"),
            (F.coalesce("n_overlap_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def c4_quality_flags(
    df: DataFrame,
    content_col: str,
    id_col: str,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 page/line heuristics (Raffel et al. 2020 §2.2), all JVM
    higher-order functions over the line array — no explode, no Python:

    * a line is KEPT iff it ends in terminal punctuation (. ! ? or a
      closing quote), has ≥ ``min_words_per_line`` words, and does not
      mention "javascript";
    * the page is dropped if it has "lorem ipsum", a curly brace, or
      fewer than ``min_sentences`` sentences (terminal-punctuation
      count), or no kept lines.

    Returns (id, n_lines, n_kept_lines, n_sentences, has_lorem_ipsum,
    has_brace, keep). Each predicate is a plain SQL expression the
    DuckDB oracle replays verbatim.
    """

    def _is_kept(ln: Column) -> Column:
        t = F.trim(ln)
        words = F.size(F.filter(F.split(t, " "), lambda w: w != ""))
        return (
            t.rlike('[.!?"]$')
            & (words >= min_words_per_line)
            & ~F.lower(t).contains("javascript")
        )

    c = F.col(content_col)
    lines = F.filter(F.split(c, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    n_kept = F.size(F.filter(lines, _is_kept))
    n_sent = F.size(F.regexp_extract_all(c, F.lit("[.!?]"), 0))
    lorem = F.lower(c).contains("lorem ipsum")
    brace = c.contains("{")
    keep = (
        (n_sent >= min_sentences) & ~lorem & ~brace & (n_kept > 0)
    )
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_brace"),
        keep.alias("keep"),
    )


# ----------------------------------------------------------- BM25 search

def bm25_topk(
    df: DataFrame,
    content_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k document search for a bag of query terms — the
    inverted-index ranking a corpus tooling layer needs (inspecting
    dedup clusters, hunting boilerplate, pulling eval-adjacent docs).
    No reference counterpart (its unit is a table sync); public
    formula (Robertson/Sparck Jones).

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with the standard smoothed ``idf = ln((N−df+0.5)/(df+0.5) + 1)``.

    Scale shape: corpus stats (N, avgdl) collapse to ONE row
    (broadcast); the postings build explodes tokens but filters to the
    query terms BEFORE the shuffle (predicate on the exploded token —
    at most |terms| postings lists survive), then one (doc, term)
    hash-agg with map-side combine; df-per-term is a ≤|terms|-row agg
    joined broadcast. Final per-doc rollup + TakeOrderedAndProject for
    the top k. Everything is JVM built-ins; ties broken by id for
    determinism. Scores rounded to 4 decimals (half-up).
    """
    from ..util import round_half_up

    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    # spread the tokenize/explode across the cluster even when the
    # corpus arrives as few input files (the single-input-task trap)
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("_id"),
        _tokens(F.lower(F.col(content_col))).alias("_tk"),
    )
    # avgdl via exact integer sum / count: float summation order varies
    # with partial aggregation, an integer sum doesn't — the one double
    # division is then bit-identical in any engine
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        (
            F.sum(F.size("_tk").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_avgdl"),
    )
    # persisted: df-per-term AND scoring both read it — without the
    # persist the whole scan+explode subtree runs twice (it is tiny:
    # at most |matching docs|·|terms| rows). Like the winnow cache
    # above, the entry lives until the session ends or the caller
    # clearCache()s — bounded by |terms| postings lists, not corpus.
    hits = (
        base.select("_id", F.size("_tk").cast("double").alias("_dl"),
                    F.explode("_tk").alias("_t"))
        .filter(F.col("_t").isin(terms))
        .groupBy("_id", "_t")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"),
             F.first("_dl").alias("_dl"))
    ).persist()
    dfreq = hits.groupBy("_t").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "_t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * F.lit(k1 + 1.0))
            / (
                F.col("_tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.sum("_s").alias("_score"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    return (
        per_doc.orderBy(F.col("_score").desc(), F.col("_id"))
        .limit(k)
        .select(
            F.col("_id").alias(id_col),
            round_half_up(F.col("_score"), 4).alias("bm25"),
            "n_terms_hit",
        )
    )
