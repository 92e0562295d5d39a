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


def conversation_docs(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """One document per conversation: turns concatenated in stable
    turn order (NULL text as '' — a tool-only turn still holds its
    position). The canonical doc form every conversation-granularity
    corpus op (near-dup, index, split) shares, and the one the DuckDB
    oracles replay as ``string_agg(coalesce(text,''), ' ' ORDER BY
    turn_idx)``. One conv_id shuffle: collect_list(struct) →
    array_sort → array_join, all JVM."""
    return df.groupBy(F.col(conv_col).alias(conv_col)).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(turn_col).alias("i"),
                            F.coalesce(F.col(text_col), F.lit("")).alias("t"),
                        )
                    )
                ),
                lambda s: s.getField("t"),
            ),
            " ",
        ).alias("doc")
    )


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


def extract_tool_calls(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Promote the semi-structured ``tool`` payload to typed columns —
    the ETL step between a raw transcript lake and tool-use analytics
    or function-calling training data.

    The reference ships tool/JSON payloads through as opaque strings
    and anonymizes inside them (internal/json-anonymizer); promotion to
    columns is the complementary read path. Per turn carrying a tool
    payload, returns::

        (conv_id, turn_idx, tool_name, tool_args: map<string,string>,
         valid: bool)

    ``valid=false`` marks payloads that are not a JSON object of the
    expected shape (``from_json`` yields NULL) — the quarantine
    predicate for a schema-on-read scan. Everything is JVM built-ins
    (`from_json` into a fixed struct; no Python): one narrow projection,
    no shuffle, and the parse prunes to exactly the two referenced
    fields at 100 TB.
    """
    parsed = F.from_json(
        F.col(tool_col),
        "name string, args map<string,string>",
    )
    return (
        df.filter(F.col(tool_col).isNotNull())
        .select(
            F.col(conv_col),
            F.col(turn_col),
            parsed["name"].alias("tool_name"),
            parsed["args"].alias("tool_args"),
            # a parseable object missing `name` is still invalid for
            # tool-call purposes: route it to the same quarantine
            parsed["name"].isNotNull().alias("valid"),
        )
    )


def tool_call_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tool_col: str = "tool",
    arg_key: str = "q",
) -> DataFrame:
    """Per-tool usage rollup over the extracted calls: ``(tool_name,
    n_calls, n_convs, n_distinct_args, mean_arg_chars)`` — one
    hash-agg shuffle on tool_name (tiny cardinality), partial
    aggregation map-side. Invalid payloads roll up under
    ``tool_name = NULL`` so damage is visible, not dropped."""
    calls = extract_tool_calls(df, conv_col, turn_col, tool_col)
    arg = F.col("tool_args").getItem(arg_key)
    return (
        calls.select(
            F.when(F.col("valid"), F.col("tool_name")).alias("tool_name"),
            F.col(conv_col).alias("_c"),
            arg.alias("_a"),
        )
        .groupBy("tool_name")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.count_distinct("_c").alias("n_convs"),
            F.count_distinct("_a").alias("n_distinct_args"),
            (
                F.floor(F.avg(F.length("_a")) * 100 + F.lit(0.5)) / 100
            ).alias("mean_arg_chars"),
        )
    )


def sft_examples(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    context_budget_chars: int = 2048,
    target_role: str = "assistant",
) -> DataFrame:
    """Explode conversations into supervised fine-tuning pairs — the
    transcripts-to-training-data conversion: every ``target_role`` turn
    becomes one example whose ``target`` is that turn's text and whose
    ``context`` is the maximal SUFFIX of prior turns (formatted
    ``role: text``, joined by newline) fitting ``context_budget_chars``
    — left truncation at whole-turn granularity, the standard chat-SFT
    windowing. Turns with NULL text are dropped before pairing (they
    can neither be targets nor context).

    Returns ``(conv_id, turn_idx, n_context_turns, context_chars,
    context, target)``; examples with no prior in-budget turn keep an
    empty context (a first-turn assistant greeting still trains).

    Scale shape: ONE shuffle on the conversation key; each
    conversation's turns are assembled with ``collect_list`` +
    ``sort_array`` (conversation-local, bounded by turn count — the
    same boundedness every chat format assumes), then targets explode
    and the suffix fit is a single O(turns) JVM ``aggregate`` fold per
    target. No Python, no window over the exploded rows.

    The cost model is exact: a suffix of k formatted turns occupies
    ``sum(len(f_i)) + (k-1)`` chars, so a turn joins the context iff
    its suffix total of ``len(f_i)+1`` stays within ``budget+1``
    (monotone in k ⇒ the maximal suffix is per-element checkable).
    """
    b1 = int(context_budget_chars) + 1
    turns = df.filter(F.col(text_col).isNotNull()).select(
        F.col(conv_col).alias("_c"),
        F.struct(
            F.col(turn_col).cast("long").alias("t"),
            F.col(role_col).alias("r"),
            F.col(text_col).alias("x"),
        ).alias("_s"),
    )
    conv = turns.groupBy("_c").agg(
        F.sort_array(F.collect_list("_s")).alias("_ts")
    )
    ex = conv.select(
        "_c", "_ts", F.posexplode("_ts").alias("_p", "_t")
    ).filter(F.col("_t")["r"] == target_role)
    # prior turns, their join costs (len('role: text') + 1 separator),
    # and the maximal in-budget suffix length k via one fold that
    # latches on overflow (acc pinned past budget so a later small
    # element can't re-enter a broken suffix)
    prior = F.slice("_ts", 1, F.col("_p"))
    kept = F.expr(
        f"""
        aggregate(
          reverse(transform(slice(_ts, 1, _p),
                            s -> length(s.r) + 2 + length(s.x) + 1)),
          named_struct('acc', CAST(0 AS BIGINT), 'k', 0),
          (st, c) -> IF(st.acc + c <= {b1},
                        named_struct('acc', st.acc + c, 'k', st.k + 1),
                        named_struct('acc', CAST({b1 + 1} AS BIGINT), 'k', st.k)),
          st -> st.k)
        """
    )
    win = F.slice(prior, F.col("_p") - F.col("_k") + 1, F.col("_k"))
    ctx = F.concat_ws(
        "\n", F.transform(win, lambda s: F.concat(s["r"], F.lit(": "), s["x"]))
    )
    return (
        ex.withColumn("_k", kept)
        .select(
            F.col("_c").alias(conv_col),
            F.col("_t")["t"].alias(turn_col),
            F.col("_k").cast("long").alias("n_context_turns"),
            F.length(ctx).cast("long").alias("context_chars"),
            ctx.alias("context"),
            F.col("_t")["x"].alias("target"),
        )
    )


def template_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    min_convs: int = 3,
) -> DataFrame:
    """Cross-conversation template detection: turns whose normalized
    text (lowercased, whitespace collapsed) recurs across at least
    ``min_convs`` DISTINCT conversations — canned greetings, refusal
    boilerplate, scripted system prompts. Within-conversation repeats
    are a degeneracy signal (``conversation_quality_flags``); ACROSS
    conversations the same repeat is templating, and a template turn's
    weight in a training mix should be its conversation count, not its
    raw frequency.

    Returns one row per ``(role, text_md5)`` template: ``(role,
    text_md5, sample_text, n_convs, n_occurrences)``.

    Scale shape: normalize + md5 JVM-side, one hash-agg on
    ``(role, md5)`` with map-side combine (count + count_distinct conv
    + min text); no joins, no windows — the same one-shuffle shape as
    exact dedup, keyed a level finer.
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    )
    t = df.filter(F.col(text_col).isNotNull()).select(
        F.col(role_col).alias("role"),
        F.md5(norm).alias("text_md5"),
        norm.alias("_x"),
        F.col(conv_col).alias("_c"),
    )
    return (
        t.groupBy("role", "text_md5")
        .agg(
            F.min("_x").alias("sample_text"),
            F.count_distinct("_c").alias("n_convs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_convs") >= int(min_convs))
    )


def preference_pairs(
    log: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    op_col: str = "op",
    order_cols: "tuple[str, str]" = ("ts", "lsn"),
    target_role: str = "assistant",
) -> DataFrame:
    """Mine DPO/RLHF preference pairs from the CHANGE LOG itself: a
    turn that was rewritten (an `update` superseding an earlier
    version of the same ``(conv_id, turn_idx)``) is a regeneration —
    the author looked at the old response and replaced it. The LWW
    winner is the implicitly-preferred ``chosen``; the latest
    superseded DISTINCT text is ``rejected``. This is data the final
    table cannot yield — only the CDC log still holds the losing
    versions, which is exactly why a preference-mining pass belongs in
    the ingest engine rather than downstream of the lake.

    Emits one row per ``target_role`` key that is alive in the final
    state and has >= 2 distinct text versions in the log:
    ``(conv_id, turn_idx, chosen, rejected, n_versions)`` with
    ``n_versions`` = count of distinct non-null texts ever written.
    Deleted keys are excluded (their winner never ships as training
    data); ``rejected`` is the version with the highest ``order_cols``
    among events whose text differs from the winner's, so a flip-flop
    A->B->A yields (chosen=A, rejected=B), not a self-pair.

    Scale shape: ONE shuffle — a single groupBy on the key with
    map-side combine; the winner is a ``max_by`` partial agg and the
    rejected pick is a JVM sort+filter over the key's own version
    list (bounded by per-turn rewrite count, the same per-key
    boundedness the LWW merge already assumes). No window, no join,
    no Python.
    """
    o = F.struct(*[F.col(c) for c in order_cols])
    ver = F.when(
        (F.col(op_col) != "delete") & F.col(text_col).isNotNull(),
        F.struct(
            *[F.col(c) for c in order_cols], F.col(text_col).alias("x")
        ),
    )  # no otherwise -> NULL, which collect_list skips
    g = (
        log.groupBy(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).alias("turn_idx"),
        )
        .agg(
            F.max_by(
                F.struct(
                    F.col(op_col).alias("op"),
                    F.col(role_col).alias("r"),
                    F.col(text_col).alias("x"),
                ),
                o,
            ).alias("_w"),
            F.sort_array(F.collect_list(ver), asc=False).alias("_vs"),
        )
        .filter(
            (F.col("_w")["op"] != "delete")
            & (F.col("_w")["r"] == target_role)
        )
    )
    losers = F.filter(F.col("_vs"), lambda v: v["x"] != F.col("_w")["x"])
    return (
        g.select(
            "conv_id",
            "turn_idx",
            F.col("_w")["x"].alias("chosen"),
            F.try_element_at(losers, F.lit(1))["x"].alias("rejected"),
            F.size(
                F.array_distinct(F.transform("_vs", lambda v: v["x"]))
            ).cast("long").alias("n_versions"),
        )
        .filter(F.col("rejected").isNotNull())
    )


def context_fit(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    token_budget: int = 512,
    pin_system: bool = True,
) -> DataFrame:
    """Token-budget context fitting: per conversation keep the maximal
    SUFFIX of turns whose cumulative whitespace-token count stays
    within ``token_budget`` — the serving/training-time truncation
    every chat stack performs before a model call. With
    ``pin_system`` the conversation's ``system`` turns survive even
    when the budget pushes them out (the standard "system prompt is
    never truncated" rule); pinned turns are flagged so the caller can
    place them ahead of the window.

    Returns the kept turns only: ``(conv_id, turn_idx, role,
    n_tokens, cum_tokens_from_end, pinned)`` where
    ``cum_tokens_from_end`` is the suffix-cumulative count that
    admitted the turn (NULL-safe: a NULL/blank text counts 0 tokens
    and always fits).

    Scale shape: one window over the conversation key (one shuffle),
    all JVM — tokenize with ``split``, suffix totals with a
    descending-ordered running sum, no explode and no Python.
    """
    from pyspark.sql.window import Window

    toks = F.when(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
        F.lit(0),
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), "\\s+")))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        toks.cast("long").alias("n_tokens"),
    ).withColumn("cum_tokens_from_end", F.sum("n_tokens").over(w))
    fits = F.col("cum_tokens_from_end") <= int(token_budget)
    pinned = (
        (F.col("role") == "system") & ~fits
        if pin_system
        else F.lit(False)
    )
    return t.filter(fits | pinned).withColumn("pinned", pinned)


def loop_flags(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    min_run: int = 3,
) -> DataFrame:
    """Agent-loop detection: per-conversation runs of consecutive turns
    with the SAME action signature — the stuck-agent failure mode
    (retrying an identical tool call, re-emitting the same apology,
    oscillating on one step). A looping trace is poison as training
    data even when every individual turn passes document-level quality
    rules, which is why this is a conversation-level gate.

    The signature normalizes (role, text, tool): lowercase, digits
    stripped, whitespace collapsed — so "retry #41" and "retry #42"
    count as the same action (an agent stuck on a counter IS looping).
    Runs are gaps-and-islands over the turn order: a turn starts a new
    run iff its signature differs null-safely from the previous turn's.

    Returns one row per conversation: ``(conv_id, n_turns, max_run,
    n_loop_turns, loop_frac, looping)`` where ``n_loop_turns`` counts
    turns inside runs of length >= ``min_run`` and ``looping`` flags
    ``max_run >= min_run``.

    Scale shape: one shuffle on the conversation key feeds both lag
    windows and the final hash-agg (conversation-local work, bounded by
    turn count — same shape as ``conversation_quality_flags``). All
    JVM; no joins, no Python.
    """
    from pyspark.sql.window import Window

    from ..util import round_half_up

    def _norm(c: str) -> F.Column:
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(c)), "[0-9]+", ""),
                "\\s+",
                " ",
            )
        )

    sig = F.concat_ws(
        "",
        F.coalesce(F.col(role_col), F.lit("")),
        F.coalesce(_norm(text_col), F.lit("")),
        F.coalesce(_norm(tool_col), F.lit("")),
    )
    w = Window.partitionBy("_c").orderBy("_t")
    t = (
        df.select(
            F.col(conv_col).alias("_c"),
            F.col(turn_col).alias("_t"),
            sig.alias("_sig"),
        )
        .withColumn(
            "_new_run",
            F.when(
                F.lag("_sig").over(w).eqNullSafe(F.col("_sig")), F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn(
            "_run_id",
            F.sum("_new_run").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    runs = t.groupBy("_c", "_run_id").agg(F.count(F.lit(1)).alias("_len"))
    return (
        runs.groupBy("_c")
        .agg(
            F.sum("_len").alias("n_turns"),
            F.max("_len").alias("max_run"),
            F.sum(
                F.when(
                    F.col("_len") >= int(min_run), F.col("_len")
                ).otherwise(F.lit(0))
            ).alias("n_loop_turns"),
        )
        .select(
            F.col("_c").alias(conv_col),
            "n_turns",
            "max_run",
            "n_loop_turns",
            round_half_up(
                F.col("n_loop_turns") / F.nullif(F.col("n_turns"), F.lit(0)),
                6,
            ).alias("loop_frac"),
            (F.col("max_run") >= int(min_run)).alias("looping"),
        )
    )


def turn_gaps(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    expect_start: int = 0,
) -> DataFrame:
    """Turn-continuity audit: one row per HOLE in a conversation's
    turn sequence — ``(conv_id, gap_start, gap_end, n_missing)`` for
    every maximal run of missing indices between ``expect_start`` and
    the conversation's max turn. The completeness check a CDC-fed
    transcript table needs before training use: deletes, dropped
    events or a partial backfill leave holes that per-turn quality
    rules cannot see (every surviving turn is individually fine), and
    the gap ranges are exactly the re-fetch requests a repair job
    would issue upstream.

    Distinct from the LSN-side ``operators/monitor`` gap detection:
    that audits the TRANSPORT (did every log sequence number arrive);
    this audits the PAYLOAD (does the final state hold a contiguous
    conversation), which transport completeness does not imply — a
    correctly-delivered delete still punches a hole.

    Scale shape: one conv_id shuffle feeds a single Window pass
    (lead + row_number over the same spec — Catalyst plans one Window
    operator), then a partition-local explode of at most 2 candidate
    gaps per turn. No joins, no second shuffle, all JVM.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("_c").orderBy("_t")
    start = int(expect_start)
    t = df.select(
        F.col(conv_col).alias("_c"), F.col(turn_col).alias("_t")
    ).select(
        "_c",
        "_t",
        F.lead("_t").over(w).alias("_nxt"),
        F.row_number().over(w).alias("_rn"),
    )
    head = F.when(
        (F.col("_rn") == 1) & (F.col("_t") > F.lit(start)),
        F.struct(
            F.lit(start).cast("int").alias("gap_start"),
            (F.col("_t") - 1).cast("int").alias("gap_end"),
        ),
    )
    mid = F.when(
        F.col("_nxt") - F.col("_t") > 1,
        F.struct(
            (F.col("_t") + 1).cast("int").alias("gap_start"),
            (F.col("_nxt") - 1).cast("int").alias("gap_end"),
        ),
    )
    return (
        t.select(
            "_c",
            F.explode(F.array_compact(F.array(head, mid))).alias("_g"),
        )
        .select(
            F.col("_c").alias(conv_col),
            F.col("_g.gap_start").alias("gap_start"),
            F.col("_g.gap_end").alias("gap_end"),
            (F.col("_g.gap_end") - F.col("_g.gap_start") + 1)
            .cast("int")
            .alias("n_missing"),
        )
    )
