"""Conversation-level structural quality flags."""

from __future__ import annotations

from neosync_spark.operators.conversations import conversation_quality_flags


def _flags(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    return {
        r["conv_id"]: r.asDict()
        for r in conversation_quality_flags(df).collect()
    }


def test_clean_conversation_keeps(spark):
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "bye"),
        ("c1", 3, "assistant", "later"),
    ]
    f = _flags(spark, rows)["c1"]
    assert f["keep"] and f["contiguous"] and f["starts_with_user"]
    assert f["n_gaps"] == 0 and f["alternation_breaks"] == 0
    assert f["dup_turn_frac"] == 0.0 and f["n_turns"] == 4


def test_gap_and_nonzero_start_flagged(spark):
    rows = [
        ("c2", 1, "user", "a"), ("c2", 2, "assistant", "b"),  # starts at 1
        ("c3", 0, "user", "a"), ("c3", 3, "assistant", "b"),  # gap 0->3
    ]
    f = _flags(spark, rows)
    assert not f["c2"]["contiguous"] and f["c2"]["n_gaps"] == 0
    assert not f["c3"]["contiguous"] and f["c3"]["n_gaps"] == 1
    assert not f["c2"]["keep"] and not f["c3"]["keep"]


def test_alternation_breaks_system_exempt(spark):
    rows = [
        ("c4", 0, "user", "a"),
        ("c4", 1, "assistant", "b"),
        ("c4", 2, "assistant", "c"),  # break
        ("c5", 0, "system", "s"),
        ("c5", 1, "system", "s2"),  # system-system: exempt
        ("c5", 2, "user", "u"),
    ]
    f = _flags(spark, rows)
    assert f["c4"]["alternation_breaks"] == 1
    assert f["c5"]["alternation_breaks"] == 0
    assert not f["c5"]["starts_with_user"]


def test_degenerate_repetition_dropped(spark):
    rows = [("c6", i, "user" if i % 2 == 0 else "assistant", "same same")
            for i in range(6)]
    rows += [("c7", 0, "user", "x"), ("c7", 1, "assistant", "y")]
    f = _flags(spark, rows)
    assert f["c6"]["dup_turn_frac"] == 1.0 and not f["c6"]["keep"]
    assert f["c7"]["keep"]


def test_single_turn_too_short(spark):
    f = _flags(spark, [("c8", 0, "user", "hi")])
    assert f["c8"]["n_turns"] == 1 and not f["c8"]["keep"]


def test_extract_tool_calls_valid_invalid_and_missing_name(spark):
    from neosync_spark.operators.conversations import (
        extract_tool_calls,
        tool_call_stats,
    )

    rows = [
        ("c1", 0, '{"name":"search","args":{"q":"spark"}}'),
        ("c1", 2, '{"name":"search","args":{"q":"duck"}}'),
        ("c2", 0, '{"name":"calc","args":{"q":"1+1"}}'),
        ("c2", 2, "not json at all {"),           # malformed
        ("c3", 0, '{"args":{"q":"orphan"}}'),      # object, no name
        ("c3", 2, None),                           # no payload: excluded
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    calls = {
        (r["conv_id"], r["turn_idx"]): r
        for r in extract_tool_calls(df).collect()
    }
    assert set(calls) == {("c1", 0), ("c1", 2), ("c2", 0), ("c2", 2), ("c3", 0)}
    assert calls[("c1", 0)]["tool_name"] == "search"
    assert calls[("c1", 0)]["tool_args"]["q"] == "spark"
    assert calls[("c1", 0)]["valid"] is True
    assert calls[("c2", 2)]["valid"] is False        # malformed JSON
    assert calls[("c2", 2)]["tool_name"] is None
    assert calls[("c3", 0)]["valid"] is False        # missing name
    assert calls[("c3", 0)]["tool_args"]["q"] == "orphan"  # args still usable

    stats = {r["tool_name"]: r for r in tool_call_stats(df).collect()}
    assert stats["search"]["n_calls"] == 2
    assert stats["search"]["n_convs"] == 1
    assert stats["search"]["n_distinct_args"] == 2
    assert stats["search"]["mean_arg_chars"] == 4.5  # len(spark)=5, len(duck)=4
    assert stats["calc"]["n_calls"] == 1
    # both invalid payloads land in the visible NULL bucket
    assert stats[None]["n_calls"] == 2
    assert stats[None]["n_distinct_args"] == 1       # only c3's parsed arg


# -- preference-pair mining from the change log --------------------------


def _pref(spark, rows):
    from neosync_spark.operators.conversations import preference_pairs

    log = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, op string, lsn long",
    )
    return {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in preference_pairs(log).collect()
    }


def test_preference_pairs_from_regenerations(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    rows = [
        # rewritten twice, flip-flop: chosen=the LWW winner A,
        # rejected=the latest DIFFERENT version B (never a self-pair)
        ("a", 1, "assistant", "A", None, t0, "insert", 1),
        ("a", 1, "assistant", "B", None, t0 + sec, "update", 2),
        ("a", 1, "assistant", "A", None, t0 + 2 * sec, "update", 3),
        # single version: no pair
        ("a", 2, "assistant", "solo", None, t0, "insert", 4),
        # rewritten then deleted: excluded (winner never ships)
        ("b", 1, "assistant", "x", None, t0, "insert", 5),
        ("b", 1, "assistant", "y", None, t0 + sec, "update", 6),
        ("b", 1, None, None, None, t0 + 2 * sec, "delete", 7),
        # wrong role: excluded
        ("c", 0, "user", "u1", None, t0, "insert", 8),
        ("c", 0, "user", "u2", None, t0 + sec, "update", 9),
    ]
    got = _pref(spark, rows)
    assert set(got) == {("a", 1)}
    p = got[("a", 1)]
    assert p["chosen"] == "A" and p["rejected"] == "B"
    assert p["n_versions"] == 2


def test_preference_pairs_order_is_lww_not_arrival(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    # late-arriving event (higher lsn, older ts) LOSES: chosen follows
    # (ts, lsn), identical to the merge's LWW rule
    rows = [
        ("a", 1, "assistant", "new", None, t0 + sec, "insert", 1),
        ("a", 1, "assistant", "old", None, t0, "update", 2),
    ]
    p = _pref(spark, rows)[("a", 1)]
    assert p["chosen"] == "new" and p["rejected"] == "old"


# -- token-budget context fitting -----------------------------------------


def test_context_fit_suffix_and_system_pin(spark):
    from neosync_spark.operators.conversations import context_fit

    rows = [
        ("a", 0, "system", "sys prompt here"),   # 3 tokens
        ("a", 1, "user", "one two three four"),  # 4
        ("a", 2, "assistant", "five six"),       # 2
        ("a", 3, "user", "seven"),               # 1
        ("b", 0, "user", None),                  # NULL text -> 0 tokens
        ("b", 1, "user", "   "),                 # blank -> 0 tokens
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in context_fit(df, token_budget=5).collect()
    }
    # budget 5 admits turns 3 (cum 1) and 2 (cum 3); turn 1 overflows
    # (cum 7) and is cut; the system turn is pinned back in
    assert set(got) == {("a", 0), ("a", 2), ("a", 3), ("b", 0), ("b", 1)}
    assert got[("a", 0)]["pinned"] is True
    assert got[("a", 2)]["pinned"] is False
    assert got[("a", 2)]["cum_tokens_from_end"] == 3
    assert got[("b", 0)]["n_tokens"] == 0 and got[("b", 1)]["n_tokens"] == 0

    nopin = {
        (r["conv_id"], r["turn_idx"])
        for r in context_fit(df, token_budget=5, pin_system=False).collect()
    }
    assert ("a", 0) not in nopin


def test_loop_flags_runs_normalization_and_nulls(spark):
    from neosync_spark.operators.conversations import loop_flags

    rows = [
        # conv "stuck": retry counter loop — digits strip to one signature
        ("stuck", 0, "user", "do the thing", None),
        ("stuck", 1, "assistant", "retry #41", '{"name":"search"}'),
        ("stuck", 2, "assistant", "retry #42", '{"name":"search"}'),
        ("stuck", 3, "assistant", "retry #43", '{"name":"search"}'),
        ("stuck", 4, "user", "stop", None),
        # conv "ok": alternating roles/content — max run 1
        ("ok", 0, "user", "hi", None),
        ("ok", 1, "assistant", "hello", None),
        ("ok", 2, "user", "bye", None),
        # conv "nulls": consecutive NULL text+tool same role IS a run
        ("nulls", 0, "assistant", None, None),
        ("nulls", 1, "assistant", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    got = {
        r["conv_id"]: r.asDict() for r in loop_flags(df, min_run=3).collect()
    }
    s = got["stuck"]
    assert (s["n_turns"], s["max_run"], s["n_loop_turns"]) == (5, 3, 3)
    assert s["looping"] is True and abs(s["loop_frac"] - 0.6) < 1e-9
    assert got["ok"]["max_run"] == 1 and got["ok"]["looping"] is False
    assert got["ok"]["n_loop_turns"] == 0
    # NULL signatures compare null-safely: a run of 2, under min_run
    n = got["nulls"]
    assert (n["max_run"], n["looping"]) == (2, False)
    # min_run=2 promotes the NULL run
    got2 = {
        r["conv_id"]: r.asDict() for r in loop_flags(df, min_run=2).collect()
    }
    assert got2["nulls"]["looping"] is True
    assert got2["nulls"]["n_loop_turns"] == 2


def test_turn_gaps_holes_and_head(spark):
    from neosync_spark.operators.conversations import turn_gaps

    rows = [
        # head gap (starts at 2) + interior hole 4..5
        ("a", 2), ("a", 3), ("a", 6),
        # contiguous from 0 — no gaps
        ("b", 0), ("b", 1), ("b", 2),
        # single turn far from 0: one head gap
        ("c", 5),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    got = sorted(tuple(r) for r in turn_gaps(df).collect())
    assert got == [
        ("a", 0, 1, 2),
        ("a", 4, 5, 2),
        ("c", 0, 4, 5),
    ]
    # custom expected start suppresses head gaps below it
    got2 = sorted(tuple(r) for r in turn_gaps(df, expect_start=2).collect())
    assert got2 == [("a", 4, 5, 2), ("c", 2, 4, 3)]


def test_turn_gaps_single_exchange(spark):
    from neosync_spark.operators.conversations import turn_gaps

    from .test_plans import _plan

    df = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).selectExpr(
        "'c' || cast(user_id % 50 as string) as conv_id",
        "cast(event_id % 16 as int) as turn_idx",
    ).distinct()
    plan = _plan(turn_gaps(df))
    # one exchange for the dedup distinct, one for the conv window
    assert plan.count("Exchange") <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
