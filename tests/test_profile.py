"""profile_columns — one-pass per-column table profile."""

from pyspark.sql import functions as F

from neosync_spark.operators.profile import profile_columns


def _by_col(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_exact_profile_nulls_distincts_and_numeric_minmax(spark):
    df = spark.createDataFrame(
        [(10, "a"), (9, "a"), (None, "b"), (2, None)], "n int, s string"
    )
    p = _by_col(profile_columns(df))
    assert set(p) == {"n", "s"}
    n = p["n"]
    assert n["n_rows"] == 4 and n["n_nulls"] == 1
    assert n["null_frac"] == 0.25
    assert n["n_distinct"] == 3  # NULL excluded
    # native-type ordering: min is 2, not lexicographic "10"
    assert (n["min_repr"], n["max_repr"]) == ("2", "10")
    s = p["s"]
    assert s["n_nulls"] == 1 and s["n_distinct"] == 2
    assert (s["min_repr"], s["max_repr"]) == ("a", "b")


def test_all_null_column_and_empty_frame(spark):
    df = spark.createDataFrame([(None,), (None,)], "x int")
    p = _by_col(profile_columns(df))["x"]
    assert p["n_nulls"] == 2 and p["null_frac"] == 1.0
    assert p["n_distinct"] == 0
    assert p["min_repr"] is None and p["max_repr"] is None

    empty = _by_col(profile_columns(spark.createDataFrame([], "x int")))["x"]
    assert empty["n_rows"] == 0 and empty["null_frac"] is None


def test_approx_path_close_and_no_expand(spark):
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 13).alias("m")
    )
    exact = _by_col(profile_columns(df))
    approx = _by_col(profile_columns(df, approx=True, rsd=0.02))
    assert approx["m"]["n_distinct"] == 13  # tiny cardinality: HLL exact
    assert abs(approx["id"]["n_distinct"] - 2000) <= 2000 * 0.05
    assert exact["id"]["n_distinct"] == 2000
    # the 100 TB path must not plan the multi-count-distinct Expand
    plan = profile_columns(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_column_subset_preserves_order(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "a int, b string, c double")
    out = profile_columns(df, ["c", "a"]).select("column").collect()
    assert [r["column"] for r in out] == ["c", "a"]
