"""Corpus-tooling operators added late in round 3: per-key lateness
stats (watermark sizing), temperature-scaled mixing plan, BM25 top-k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neosync_spark.operators.mixing import temperature_mix_plan
from neosync_spark.operators.sessions import lateness_stats
from neosync_spark.operators.text import bm25_topk


# --------------------------------------------------------- lateness_stats

def _log(spark):
    # key "a": arrival order (lsn) 1..4, event times 10s, 30s, 20s, 25s
    #   -> events 3 and 4 are late by 10s and 5s
    # key "b": perfectly ordered
    rows = [
        ("a", 1, "2024-01-01 00:00:10"),
        ("a", 2, "2024-01-01 00:00:30"),
        ("a", 3, "2024-01-01 00:00:20"),
        ("a", 4, "2024-01-01 00:00:25"),
        ("b", 5, "2024-01-01 00:00:01"),
        ("b", 6, "2024-01-01 00:00:02"),
    ]
    return spark.createDataFrame(rows, "conv_id string, lsn long, ts string")


def test_lateness_basic(spark):
    out = {
        r["conv_id"]: r
        for r in lateness_stats(_log(spark), "conv_id", "ts", "lsn").collect()
    }
    a = out["a"]
    assert a["n_events"] == 4
    assert a["n_late"] == 2
    assert a["max_lateness_us"] == 10_000_000
    assert a["sum_lateness_us"] == 15_000_000
    b = out["b"]
    assert b["n_late"] == 0 and b["max_lateness_us"] == 0


def test_lateness_first_event_never_late(spark):
    one = spark.createDataFrame(
        [("x", 1, "2024-01-01 00:00:00")], "conv_id string, lsn long, ts string"
    )
    r = lateness_stats(one, "conv_id", "ts", "lsn").collect()[0]
    assert r["n_late"] == 0 and r["max_lateness_us"] == 0


# ----------------------------------------------------- temperature_mix_plan

def _docs(spark):
    rows = []
    for i in range(90):
        rows.append((i, "web", "w " * 10))  # 10 tokens each -> 900
    for i in range(90, 100):
        rows.append((i, "code", "c " * 10))  # 10 tokens each -> 100
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mix_plan_alpha_upsamples_small_source(spark):
    from neosync_spark.operators.text import token_count

    plan = temperature_mix_plan(
        _docs(spark), "source", token_count("text").cast("long"),
        budget_tokens=1000, alpha=0.5, max_epochs=4.0,
    )
    rows = {r["source"]: r for r in plan.collect()}
    web, code = rows["web"], rows["code"]
    assert web["n_tokens"] == 900 and code["n_tokens"] == 100
    assert web["raw_share"] == 0.9 and code["raw_share"] == 0.1
    # alpha=0.5: shares proportional to sqrt(tokens) -> 30 : 10 = 0.75 : 0.25
    assert web["temp_share"] == 0.75 and code["temp_share"] == 0.25
    assert web["planned_tokens"] == 750 and code["planned_tokens"] == 250
    # code is upsampled 2.5 epochs; web undersampled
    assert code["epochs"] == 2.5
    assert abs(web["epochs"] - round(750 / 900, 4)) < 1e-9


def test_mix_plan_epoch_cap(spark):
    from neosync_spark.operators.text import token_count

    plan = temperature_mix_plan(
        _docs(spark), "source", token_count("text").cast("long"),
        budget_tokens=100_000, alpha=0.5, max_epochs=4.0,
    )
    rows = {r["source"]: r for r in plan.collect()}
    # code would need 25 epochs; capped at 4
    assert rows["code"]["epochs"] == 4.0
    # planned_tokens reports the uncapped plan (budget is not redistributed)
    assert rows["code"]["planned_tokens"] == 25_000


def test_mix_plan_alpha_one_is_proportional(spark):
    from neosync_spark.operators.text import token_count

    plan = temperature_mix_plan(
        _docs(spark), "source", token_count("text").cast("long"),
        budget_tokens=1000, alpha=1.0,
    )
    rows = {r["source"]: r for r in plan.collect()}
    assert rows["web"]["temp_share"] == rows["web"]["raw_share"] == 0.9


# ----------------------------------------------------------------- bm25

def _search_corpus(spark):
    rows = [
        (1, "merge the window checkpoint merge merge"),
        (2, "window window window and more window talk"),
        (3, "checkpoint"),
        (4, "nothing relevant here at all in this one"),
        (5, "merge window"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranking_and_scores(spark):
    out = bm25_topk(
        _search_corpus(spark), "text", "doc_id",
        ["merge", "window", "checkpoint"], k=10,
    ).collect()
    got = {r["doc_id"]: r for r in out}
    # doc 4 matches nothing -> absent
    assert 4 not in got
    assert len(out) == 4
    # doc 1 hits all three terms and should beat single-term docs
    assert out[0]["doc_id"] == 1 and got[1]["n_terms_hit"] == 3
    # hand-computed check for doc 3 (tf=1, dl=1):
    # N=5, avgdl=(6+7+1+8+2)/5=4.8; df(checkpoint)=2
    idf = math.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0)
    s = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 1 / 4.8))
    assert abs(got[3]["bm25"] - round(s, 4)) < 1e-9


def test_bm25_deterministic_tiebreak(spark):
    rows = [(i, "merge") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, "text", "doc_id", ["merge"], k=5).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 4]


def test_bm25_empty_terms_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        bm25_topk(_search_corpus(spark), "text", "doc_id", [])


# ---------------------------------------------------------- rate anomalies

def test_rate_anomalies(spark):
    from neosync_spark.operators.monitor import op_rate_anomalies

    rows = []
    # insert: 1/hour for 10 hours, then a 100-event spike in hour 10
    for h in range(10):
        rows.append(("insert", f"2024-01-01 {h:02d}:30:00"))
    rows += [("insert", "2024-01-01 10:30:00")] * 100
    # delete: perfectly flat over the WHOLE global span (gap-fill
    # would zero-fill any missing hour) -> stddev 0 -> NULL z
    for h in range(11):
        rows.append(("delete", f"2024-01-01 {h:02d}:15:00"))
    df = spark.createDataFrame(rows, "op string, ts string")
    out = op_rate_anomalies(df, bucket="hour", z_threshold=3.0).collect()
    ins = {r["bucket_ts"]: r for r in out if r["op"] == "insert"}
    assert len(ins) == 11
    spike = ins["2024-01-01 10:00:00"]
    assert spike["n_events"] == 100 and spike["anomalous"]
    # mean = (10*1 + 100)/11 = 10.0
    assert spike["mean_rate"] == 10.0
    assert spike["z_score"] > 3.0
    normal = ins["2024-01-01 05:00:00"]
    assert not normal["anomalous"] and normal["z_score"] < 0
    dels = [r for r in out if r["op"] == "delete"]
    assert all(r["z_score"] is None and not r["anomalous"] for r in dels)


def test_rate_anomalies_gap_fill_flags_outage(spark):
    """A total outage must surface as zero-count buckets (and can be
    anomalous), not silently vanish from the grid."""
    from neosync_spark.operators.monitor import op_rate_anomalies

    rows = []
    for h in range(10):          # steady 20/hour...
        rows += [("insert", f"2024-01-01 {h:02d}:30:00")] * 20
    rows.append(("insert", "2024-01-01 15:30:00"))  # ...gap, then one event
    df = spark.createDataFrame(rows, "op string, ts string")
    out = {r["bucket_ts"]: r for r in op_rate_anomalies(df, bucket="hour").collect()}
    # 16 buckets: 00..15 inclusive, the 10..14 outage gap-filled
    assert len(out) == 16
    gap = out["2024-01-01 12:00:00"]
    assert gap["n_events"] == 0 and gap["z_score"] < 0


def test_suggest_watermark(spark):
    from neosync_spark.operators.sessions import suggest_watermark

    rows = [("a", i, f"2024-01-01 00:00:{i:02d}") for i in range(1, 50)]
    rows.append(("a", 50, "2024-01-01 00:00:10"))  # 39s late
    df = spark.createDataFrame(rows, "conv_id string, lsn long, ts string")
    zero_loss = suggest_watermark(df, quantile=1.0)
    assert zero_loss["lateness_us"] == 39_000_000
    assert zero_loss["delay"] == "39 seconds"
    assert zero_loss["max_lateness_us"] == 39_000_000
    # p50 of a mostly-on-time stream: no delay needed
    assert suggest_watermark(df, quantile=0.5)["delay"] == "0 seconds"
    import pytest

    with pytest.raises(ValueError):
        suggest_watermark(df, quantile=0.0)


class TestColumnDrift:
    def test_identical_states_near_zero_psi(self, spark):
        from neosync_spark.operators.monitor import column_drift

        df = spark.createDataFrame(
            [(f"r{i % 3}", f"t{i}") for i in range(300)], "a string, b string"
        )
        out = {
            r["col_name"]: r
            for r in column_drift(df, df, ["a", "b"], n_buckets=16).collect()
        }
        assert set(out) == {"a", "b"}
        for r in out.values():
            assert r["psi"] == 0.0 and not r["drifted"]
            assert r["n_a"] == r["n_b"] == 300

    def test_mass_movement_flags_drift(self, spark):
        from neosync_spark.operators.monitor import column_drift

        a = spark.createDataFrame(
            [("enum_A",) for _ in range(400)], "v string"
        )
        b = spark.createDataFrame(
            [("enum_B",) for _ in range(400)], "v string"
        )
        row = column_drift(a, b, ["v"], n_buckets=16).collect()[0]
        assert row["drifted"] and row["psi"] > 1.0

    def test_null_rate_drift_detected(self, spark):
        """NULL-rate movement is the most common real incident: same
        values, but half the rows went NULL."""
        from neosync_spark.operators.monitor import column_drift

        a = spark.createDataFrame([("x",)] * 400, "v string")
        b = spark.createDataFrame(
            [("x",)] * 200 + [(None,)] * 200, "v string"
        )
        row = column_drift(a, b, ["v"], n_buckets=16).collect()[0]
        assert row["drifted"] and row["n_b"] == 400

    def test_small_shift_below_threshold(self, spark):
        from neosync_spark.operators.monitor import column_drift

        a = spark.createDataFrame(
            [(f"v{i % 10}",) for i in range(1000)], "v string"
        )
        # 2% of mass moves between existing values
        b = spark.createDataFrame(
            [(f"v{i % 10}",) for i in range(980)] + [("v0",)] * 20,
            "v string",
        )
        row = column_drift(a, b, ["v"], n_buckets=16).collect()[0]
        assert not row["drifted"] and 0.0 <= row["psi"] < 0.2

    def test_empty_cols_raises(self, spark):
        import pytest

        from neosync_spark.operators.monitor import column_drift

        df = spark.createDataFrame([("x",)], "v string")
        with pytest.raises(ValueError):
            column_drift(df, df, [])


class TestLsnGaps:
    """Exact LSN-continuity audit (operators/monitor.lsn_gaps)."""

    def _gaps(self, spark, lsns, **kw):
        from neosync_spark.operators.monitor import lsn_gaps

        df = spark.createDataFrame([(int(x),) for x in lsns], "lsn long")
        rows = lsn_gaps(df, **kw).collect()
        return sorted((r["gap_lo"], r["gap_hi"], r["n_missing"]) for r in rows)

    def _oracle(self, lsns):
        s = sorted(set(lsns))
        out = []
        for a, b in zip(s, s[1:]):
            if b > a + 1:
                out.append((a + 1, b - 1, b - a - 1))
        return out

    def test_matches_lag_oracle_with_cross_and_intra_block_gaps(self, spark):
        # gaps inside a block, spanning block edges, and whole blocks missing
        lsns = list(range(0, 50)) + list(range(53, 120)) + list(range(400, 420)) \
            + list(range(423, 430)) + [1000]
        got = self._gaps(spark, lsns, block=64)
        assert got == self._oracle(lsns)

    def test_duplicates_do_not_fake_continuity_or_gaps(self, spark):
        lsns = [0, 1, 1, 1, 5, 5, 6]
        assert self._gaps(spark, lsns, block=4) == [(2, 4, 3)]

    def test_contiguous_log_reports_nothing(self, spark):
        assert self._gaps(spark, range(100), block=16) == []

    def test_shuffle_join_fallback_agrees(self, spark):
        lsns = [0, 2, 9, 33, 34, 70]
        assert self._gaps(spark, lsns, block=8, broadcast_suspects=False) \
            == self._oracle(lsns)
