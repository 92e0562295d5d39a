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


class TestPercentiles:
    def test_exact_interpolation(self, spark):
        from neosync_spark.operators.profile import numeric_percentiles

        df = spark.createDataFrame(
            [(float(v),) for v in [1, 3.5, 2, 9.25, 4, 7.5, 0.5]], "v double"
        )
        got = {
            r["p"]: r["value"]
            for r in numeric_percentiles(df, ["v"], ps=(0.25, 0.5, 0.75)).collect()
        }
        assert got == {0.25: 1.5, 0.5: 3.5, 0.75: 5.75}

    def test_approx_close_to_exact_and_single_job(self, spark):
        from neosync_spark.operators.profile import numeric_percentiles

        df = spark.range(10000).selectExpr("cast(id as double) AS v")
        exact = {
            (r["column"], r["p"]): r["value"]
            for r in numeric_percentiles(df, ["v"]).collect()
        }
        approx = numeric_percentiles(df, ["v"], approx=True)
        plan = approx._jdf.queryExecution().executedPlan().toString()
        # GK sketch partial-aggregates map-side — no Expand, no Sort of
        # the input, no Python
        assert "partial_percentile_approx" in plan
        assert "EvalPython" not in plan
        for r in approx.collect():
            e = exact[(r["column"], r["p"])]
            assert abs(r["value"] - e) <= max(2.0, 0.01 * e)

    def test_nulls_ignored_and_all_null(self, spark):
        from neosync_spark.operators.profile import numeric_percentiles

        df = spark.createDataFrame(
            [(1.0, None), (3.0, None), (None, None)],
            "a double, b double",
        )
        got = {
            (r["column"], r["p"]): r["value"]
            for r in numeric_percentiles(df, ["a", "b"], ps=(0.5,)).collect()
        }
        assert got[("a", 0.5)] == 2.0 and got[("b", 0.5)] is None

    def test_empty_cols_raises(self, spark):
        import pytest

        from neosync_spark.operators.profile import numeric_percentiles

        with pytest.raises(ValueError):
            numeric_percentiles(spark.range(1), [])


def test_percentiles_quoted_column_names(spark):
    from neosync_spark.operators.profile import numeric_percentiles

    df = spark.createDataFrame([(1.0,), (3.0,)], ["price-usd"])
    got = numeric_percentiles(df, ["price-usd"], ps=(0.5,)).collect()
    assert got[0]["value"] == 2.0
    import pytest

    with pytest.raises(ValueError, match="illegal"):
        numeric_percentiles(df, ["bad`name"], ps=(0.5,))
