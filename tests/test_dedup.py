"""LWW dedup: agg plan == window plan == pandas oracle."""

from __future__ import annotations

from neosync_spark.operators.dedup import lww_dedup, lww_dedup_window
from neosync_spark.synth import SynthConfig, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=3_000, n_convs=150)


def _oracle(log):
    df = log.sort_values(["ts", "lsn"], kind="mergesort")
    return (
        df.groupby(["conv_id", "turn_idx"], as_index=False)
        .tail(1)
        .reset_index(drop=True)
    )


def test_lww_agg_matches_oracle(spark):
    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log)
    got = lww_dedup(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"]).toPandas()
    exp = _oracle(log)
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])


def test_lww_window_matches_agg(spark):
    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log)
    a = lww_dedup(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"]).toPandas()
    w = lww_dedup_window(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"]).toPandas()
    assert_pdf_equal(a, w, ["conv_id", "turn_idx"])


def test_lww_agg_is_partial_agg_plan(spark):
    """The agg LWW must plan as partial+final hash agg (map-side combine
    = the skew defense). Assert no Window/Sort in the physical plan."""
    log = generate_pandas(SynthConfig(n_events=500, n_convs=20))
    sdf = spark.createDataFrame(log)
    plan = lww_dedup(sdf, ["conv_id", "turn_idx"], ["ts", "lsn"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan
