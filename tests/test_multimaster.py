from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from neosync_spark.operators.multimaster import (
    multimaster_merge,
    site_divergence_report,
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, op string, text string, "
        "ts timestamp, lsn long, site string"
    )


def test_latest_ts_wins_across_sites(spark):
    log = _log(
        spark,
        [
            ("c1", 0, "insert", "us-old", _ts(1), 10, "us"),
            ("c1", 0, "update", "eu-new", _ts(5), 3, "eu"),
        ],
    )
    out = multimaster_merge(log, ["conv_id", "turn_idx"], ["us", "eu"])
    assert out.collect()[0]["text"] == "eu-new"


def test_ts_tie_delete_wins_then_priority(spark):
    log = _log(
        spark,
        [
            ("c1", 0, "update", "us-upd", _ts(5), 10, "us"),
            ("c1", 0, "delete", None, _ts(5), 3, "eu"),
            ("c2", 0, "update", "us-upd", _ts(5), 10, "us"),
            ("c2", 0, "update", "eu-upd", _ts(5), 99, "eu"),
        ],
    )
    out = {
        r["conv_id"]: r
        for r in multimaster_merge(
            log, ["conv_id", "turn_idx"], ["us", "eu"]
        ).collect()
    }
    # concurrent delete beats the update regardless of site priority
    assert out["c1"]["op"] == "delete"
    # pure ts tie between updates: site priority (us first), not lsn
    assert out["c2"]["text"] == "us-upd"


def test_delete_wins_off_falls_to_priority(spark):
    log = _log(
        spark,
        [
            ("c1", 0, "update", "us-upd", _ts(5), 10, "us"),
            ("c1", 0, "delete", None, _ts(5), 3, "eu"),
        ],
    )
    out = multimaster_merge(
        log, ["conv_id", "turn_idx"], ["us", "eu"], delete_wins=False
    )
    assert out.collect()[0]["op"] == "update"


def test_within_site_lsn_breaks_everything(spark):
    log = _log(
        spark,
        [
            ("c1", 0, "update", "v1", _ts(5), 1, "us"),
            ("c1", 0, "update", "v2", _ts(5), 2, "us"),
        ],
    )
    out = multimaster_merge(log, ["conv_id", "turn_idx"], ["us", "eu"])
    assert out.collect()[0]["text"] == "v2"


def test_unknown_site_loses_to_listed(spark):
    log = _log(
        spark,
        [
            ("c1", 0, "update", "rogue", _ts(5), 999, "ap"),
            ("c1", 0, "update", "eu-upd", _ts(5), 1, "eu"),
        ],
    )
    out = multimaster_merge(log, ["conv_id", "turn_idx"], ["us", "eu"])
    assert out.collect()[0]["text"] == "eu-upd"


def test_merge_is_order_insensitive(spark):
    rows = [
        ("c1", 0, "insert", "a", _ts(1), 1, "us"),
        ("c1", 0, "update", "b", _ts(2), 1, "eu"),
        ("c1", 0, "update", "c", _ts(2), 2, "us"),
        ("c2", 1, "delete", None, _ts(3), 5, "eu"),
        ("c2", 1, "update", "d", _ts(3), 9, "us"),
    ]
    a = multimaster_merge(
        _log(spark, rows), ["conv_id", "turn_idx"], ["us", "eu"]
    )
    b = multimaster_merge(
        _log(spark, rows[::-1]), ["conv_id", "turn_idx"], ["us", "eu"]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_divergence_report(spark):
    log = _log(
        spark,
        [
            # c1: both sites settled on the same text -> agree
            ("c1", 0, "update", "same", _ts(1), 1, "us"),
            ("c1", 0, "update", "same", _ts(2), 1, "eu"),
            # c2: sites disagree on latest text -> diverged
            ("c2", 0, "update", "us-v", _ts(1), 1, "us"),
            ("c2", 0, "update", "eu-v", _ts(2), 1, "eu"),
            # c3: one site only -> never diverged
            ("c3", 0, "update", "solo", _ts(1), 1, "us"),
            # c4: NULL text vs 'NULL' string must NOT collide
            ("c4", 0, "update", None, _ts(1), 1, "us"),
            ("c4", 0, "update", "\x00", _ts(1), 1, "eu"),
        ],
    )
    rep = site_divergence_report(
        log, ["conv_id", "turn_idx"], ["text"]
    )
    got = {r["conv_id"]: (r["n_sites"], r["n_states"]) for r in rep.collect()}
    assert set(got) == {"c2", "c4"}
    assert got["c2"] == (2, 2)


def test_merge_plan_is_single_hash_agg(spark):
    log = _log(spark, [("c1", 0, "insert", "a", _ts(1), 1, "us")])
    plan = multimaster_merge(
        log, ["conv_id", "turn_idx"], ["us", "eu"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Window" not in plan
    assert plan.count("Exchange") == 1
