"""Re-identification audits (operators/privacy): k-anonymity and
l-diversity censuses, NULL-as-value grouping, and the generalize →
re-audit remediation loop."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from neosync_spark.functions.transformers import (
    transform_generalize_date,
    transform_generalize_number,
    transform_generalize_prefix,
)
from neosync_spark.operators.privacy import (
    k_anonymity_report,
    l_diversity_report,
)


def _people(spark):
    # (zip, age, diagnosis): one unique zip/age row (re-identifiable),
    # one homogeneous class (k-safe but not diverse)
    rows = [
        ("94117", 34, "flu"),
        ("94117", 34, "cold"),
        ("94117", 34, "flu"),
        ("94118", 35, "measles"),          # class of 1
        ("02139", 60, "flu"), ("02139", 60, "flu"),
        ("02139", 60, "flu"), ("02139", 60, "flu"),  # k=4, diversity 1
        (None, 50, "flu"),                  # NULL zip class of 1
    ]
    return spark.createDataFrame(rows, "zip string, age int, dx string")


def test_k_anonymity_census(spark):
    df = _people(spark)
    r = k_anonymity_report(df, ["zip", "age"], k=3).collect()[0]
    assert r["n_rows"] == 9 and r["n_classes"] == 4
    assert r["min_class_size"] == 1
    # classes below 3: the 94118 row and the NULL-zip row
    assert r["rows_below_k"] == 2 and not r["k_satisfied"]
    assert abs(r["pct_below_k"] - 0.2222) < 1e-9


def test_l_diversity_census(spark):
    df = _people(spark)
    r = l_diversity_report(df, ["zip", "age"], "dx", l=2).collect()[0]
    assert r["n_classes"] == 4
    assert r["min_diversity"] == 1
    # homogeneous classes: 02139 (4 rows, all flu), 94118 (1), NULL (1)
    assert r["classes_below_l"] == 3 and r["rows_below_l"] == 6
    assert not r["l_satisfied"]


def test_generalize_then_reaudit_merges_classes(spark):
    df = _people(spark)
    gen = df.select(
        transform_generalize_prefix(length=3).column_expr("zip").alias("zip"),
        transform_generalize_number(width=10).column_expr("age").alias("age"),
        "dx",
    )
    before = k_anonymity_report(df, ["zip", "age"], k=3).collect()[0]
    after = k_anonymity_report(gen, ["zip", "age"], k=3).collect()[0]
    assert after["n_classes"] < before["n_classes"]
    assert after["rows_below_k"] < before["rows_below_k"]
    # the two 941xx classes merged: ("941**", "30-39") now has 4 rows
    cls = {
        (r["zip"], r["age"]): r["n"]
        for r in gen.groupBy("zip", "age").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert cls[("941**", "30-39")] == 4


def test_generalizers_match_pandas_and_jvm(spark):
    vals = ["2026-03-15 10:00:00", None]
    fn = transform_generalize_date(granularity="month")
    assert fn(pd.Series(vals), pd.Series(["a", "b"])).tolist() == [
        "2026-03", None
    ]
    got = (
        spark.createDataFrame([(v,) for v in vals], "d string")
        .select(fn.column_expr("d").alias("g"))
        .collect()
    )
    assert [r["g"] for r in got] == ["2026-03", None]

    fnum = transform_generalize_number(width=1000)
    sv = spark.createDataFrame([(1234.5,), (-1.0,), (None,)], "v double")
    got2 = [r["g"] for r in sv.select(fnum.column_expr("v").alias("g")).collect()]
    assert got2 == ["1000-1999", "-1000--1", None]
    assert fnum(pd.Series([1234.5, -1.0, None]),
                pd.Series(["a", "b", "c"])).tolist() == got2


def test_t_closeness_census(spark):
    from neosync_spark.operators.privacy import t_closeness_report

    df = _people(spark)
    # global dx distribution: flu 7/9, cold 1/9, measles 1/9
    r = t_closeness_report(df, ["zip", "age"], "dx", t=0.3).collect()[0]
    assert r["n_rows"] == 9 and r["n_classes"] == 4
    # hand-computed TVDs:
    #  94117/34 (flu 2/3, cold 1/3): .5*(|2/3-7/9| + |1/3-1/9| + 1/9)
    #    = .5*(1/9 + 2/9 + 1/9) = 2/9 ≈ 0.222222
    #  02139/60 (all flu):          .5*(|1-7/9| + 2/9) = 2/9
    #  NULL/50 (all flu):           2/9
    #  94118/35 (all measles):      .5*(|1-1/9| + 7/9 + 1/9) = 8/9
    assert abs(r["max_tvd"] - 8 / 9) < 1e-6
    assert r["classes_above_t"] == 1 and r["rows_above_t"] == 1
    assert not r["t_satisfied"]

    # relaxed t admits everything
    r2 = t_closeness_report(df, ["zip", "age"], "dx", t=0.9).collect()[0]
    assert r2["t_satisfied"] and r2["classes_above_t"] == 0

    # a perfectly proportional class passes at tight t
    prop = spark.createDataFrame(
        [("a", "x")] * 7 + [("a", "y")] * 2
        + [("b", "x")] * 7 + [("b", "y")] * 2,
        "q string, s string",
    )
    r3 = t_closeness_report(prop, ["q"], "s", t=0.01).collect()[0]
    assert r3["max_tvd"] == 0.0 and r3["t_satisfied"]

    # NULL sensitive is a VALUE (module doctrine): rows must not
    # vanish from the census, and a NULL-skewed class shows distance
    nulls = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", "x"), ("b", "x")],
        "q string, s string",
    )
    r4 = t_closeness_report(nulls, ["q"], "s", t=0.9).collect()[0]
    assert r4["n_rows"] == 4 and r4["n_classes"] == 2
    # global: x 3/4, NULL 1/4; class a (x 1/2, NULL 1/2):
    # tvd = .5*(|.5-.75| + |.5-.25|) = 0.25
    assert abs(r4["max_tvd"] - 0.25) < 1e-6
