"""profile_table (functions/profile.py)."""

import pytest
from pyspark.sql import functions as F

from pandance_spark.functions.profile import profile_table


def test_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (2, "x", 5.0), (3, None, 5.0), (3, None, None)],
        "id int, s string, v double",
    )
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["id"]["n_nulls"], got["id"]["n_distinct"]) == (0, 3)
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (2, 1)
    assert (got["v"]["n_nulls"], got["v"]["n_distinct"]) == (2, 1)


def test_profile_subset_approx_and_validation(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], "a int, b int")
    exact = {r["col_name"]: r["n_distinct"]
             for r in profile_table(df, ["a", "b"]).collect()}
    assert exact == {"a": 100, "b": 3}
    approx = {r["col_name"]: r["n_distinct"]
              for r in profile_table(df, ["a", "b"], approx=True).collect()}
    assert abs(approx["a"] - 100) <= 10 and approx["b"] == 3
    with pytest.raises(ValueError):
        profile_table(df, [])
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])


def test_profile_single_pass_plan(spark):
    # one Expand-based agg -> the parquet/source is scanned ONCE
    df = spark.createDataFrame([(1, "a")] * 10, "x int, y string")
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    assert "Expand" in plan


def test_profile_awkward_column_names(spark):
    df = spark.createDataFrame([(1, 2)], "`a.b` int, `o'flag` int")
    got = {r["col_name"]: r["n_distinct"] for r in profile_table(df).collect()}
    assert got == {"a.b": 1, "o'flag": 1}


def test_profile_backslash_column_name(spark):
    # r5 advice fix: backslash in a name must survive the stack()
    # literal even with escapedStringLiterals=false (the default)
    df = spark.createDataFrame([(1,)], ["a\\nb"])
    got = {r["col_name"]: r["n_distinct"] for r in profile_table(df).collect()}
    assert got == {"a\\nb": 1}


def test_skew_report_heavy_hitters(spark):
    from pandance_spark.functions.profile import skew_report

    rows = [("a", 1)] * 6 + [("b", 1)] * 3 + [("c", None)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {
        (r["col_name"], r["value"], r["rank"]): (r["cnt"], r["share"])
        for r in skew_report(df, top_k=2).collect()
    }
    assert got[("k", "a", 1)] == (6, 0.6)
    assert got[("k", "b", 2)] == (3, 0.3)
    assert got[("v", "1", 1)] == (9, 0.9)
    assert got[("v", None, 2)] == (1, 0.1)  # NULL reported as a value
    with pytest.raises(ValueError):
        skew_report(df, [])
    with pytest.raises(ValueError):
        skew_report(df, ["nope"])
    with pytest.raises(ValueError):
        skew_report(df, top_k=0)
