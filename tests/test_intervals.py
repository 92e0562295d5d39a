"""SQL INTERVAL ingest encode (functions/intervals.py) — the
parquet-representable months/days/micros triple of the reference's
interval type (internal/neosync-types/interval.go:13-15)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.functions.intervals import (
    INTERVAL_STRUCT,
    interval_struct,
    interval_to_text,
    parse_pg_interval,
)


CASES = [
    ("1 year 2 mons 3 days 04:05:06.789", (14, 3, 14_706_789_000)),
    ("-1 mons 10 days", (-1, 10, 0)),
    ("00:00:00", (0, 0, 0)),
    ("-04:30:00", (0, 0, -16_200_000_000)),
    ("2 years", (24, 0, 0)),
    ("5 days 12:00:00.5", (0, 5, 43_200_500_000)),
    ("-3 days", (0, -3, 0)),
]


def test_parse_components(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "s string")
    got = {
        r["s"]: (r["iv"]["months"], r["iv"]["days"], r["iv"]["micros"])
        for r in df.select("s", parse_pg_interval("s").alias("iv")).collect()
    }
    for s, exp in CASES:
        assert got[s] == exp, (s, got[s], exp)


def test_null_and_empty(spark):
    df = spark.createDataFrame([("",), (None,)], "s string")
    out = df.select(parse_pg_interval("s").alias("iv")).collect()
    assert out[0]["iv"] is None and out[1]["iv"] is None


def test_round_trip_and_wire_triple(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "s string")
    iv = df.select("s", parse_pg_interval("s").alias("iv"))
    rt = iv.select(
        "iv", parse_pg_interval(interval_to_text("iv")).alias("iv2")
    ).collect()
    for r in rt:
        assert r["iv"] == r["iv2"]
    # assemble from split columns == parse of the text form
    tri = spark.createDataFrame([(14, 3, 14_706_789_000)], "m int, d int, u long")
    got = tri.select(interval_struct("m", "d", "u").alias("iv")).collect()[0]["iv"]
    assert (got["months"], got["days"], got["micros"]) == (14, 3, 14_706_789_000)


def test_parse_is_pure_jvm(spark):
    df = spark.createDataFrame([("1 day",)], "s string")
    plan = (
        df.select(parse_pg_interval("s").alias("iv"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_interval_default_transform(spark):
    """Default anonymization jitters micros, keeps calendar fields."""
    from neosync_spark.operators.defaults import apply_default_transforms

    df = spark.createDataFrame(
        [(1, "1 year 3 days 01:00:00"), (2, None)], "id int, s string"
    ).select("id", parse_pg_interval("s").alias("iv"))
    out = apply_default_transforms(
        df, mapped_cols=set(), key_cols=["id"], seed=7
    ).collect()
    by_id = {r["id"]: r["iv"] for r in out}
    assert by_id[2] is None
    got = by_id[1]
    assert got["months"] == 12 and got["days"] == 3
    assert got["micros"] != 3_600_000_000  # jittered
    assert got.asDict().keys() == {"months", "days", "micros"}


def test_round_trip_near_int64_max(spark):
    """Review finding: double division rounded hh for |micros| >= 2^53;
    rendering must use exact integer arithmetic."""
    big = 7_199_999_999_999_999_999
    df = spark.createDataFrame([(3, 1, big), (0, 0, -big)], "m int, d int, u long")
    iv = df.select(interval_struct("m", "d", "u").alias("iv"))
    rt = iv.select(
        "iv", parse_pg_interval(interval_to_text("iv")).alias("iv2")
    ).collect()
    for r in rt:
        assert r["iv"] == r["iv2"], (r["iv"], r["iv2"])
