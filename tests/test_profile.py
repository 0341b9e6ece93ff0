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


def test_heavy_hitters_exact_vs_groupby(spark):
    from pandance_spark.functions.profile import heavy_hitters

    # Zipf-ish: value i appears 200//(i+1) times
    rows = [(f"v{i}",) for i in range(40) for _ in range(200 // (i + 1))]
    df = spark.createDataFrame(rows, "t string").repartition(7)
    support = 0.02
    got = [
        (r["value"], r["cnt"], r["share"])
        for r in heavy_hitters(df, "t", support=support).collect()
    ]
    # independent exact replay
    from collections import Counter

    cnt = Counter(r[0] for r in rows)
    total = sum(cnt.values())
    want = sorted(
        [
            (v, n, round(n / total, 6))
            for v, n in cnt.items()
            if n > support * total
        ],
        key=lambda x: (-x[1], x[0]),
    )
    assert got == want
    assert len(got) > 3  # the threshold actually bites mid-list


def test_heavy_hitters_nulls_and_k(spark):
    from pandance_spark.functions.profile import heavy_hitters

    rows = [("a",)] * 8 + [("b",)] * 4 + [(None,)] * 8 + [("c",)] * 1
    df = spark.createDataFrame(rows, "t string")
    got = heavy_hitters(df, "t", support=0.1, k=1).collect()
    # share over NON-null rows (13), null never reported
    assert [(r["value"], r["cnt"], r["share"]) for r in got] == [
        ("a", 8, round(8 / 13, 6))
    ]
    import pytest as _pt

    with _pt.raises(ValueError):
        heavy_hitters(df, "t", support=1e-5)
    with _pt.raises(ValueError):
        heavy_hitters(df, "t", k=0)


def test_heavy_hitters_large_candidate_path(spark):
    from pandance_spark.functions.profile import heavy_hitters

    # ~300 distinct frequent-ish values forces the broadcast semi-join
    # branch (candidate set > 256); result must stay exact
    rows = [(f"k{i:03d}",) for i in range(300) for _ in range(3)]
    rows += [("hot",)] * 120
    df = spark.createDataFrame(rows, "t string").repartition(5)
    got = heavy_hitters(df, "t", support=0.05).collect()
    assert [(r["value"], r["cnt"]) for r in got] == [("hot", 120)]


def test_heavy_hitters_none_found(spark):
    from pandance_spark.functions.profile import heavy_hitters

    df = spark.createDataFrame([(f"u{i}",) for i in range(100)], "t string")
    out = heavy_hitters(df, "t", support=0.5)
    assert out.count() == 0
    assert out.columns == ["value", "cnt", "share"]


# ---------------------------------------------------------------- funnel
from pandance_spark.functions.profile import drop_reason, filter_funnel


def _funnel_docs(spark):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(id=1, lang="en", n=100),   # kept
            Row(id=2, lang="en", n=5),     # fails rule 0 (n >= 10)
            Row(id=3, lang="de", n=100),   # fails rule 1 (lang == en)
            Row(id=4, lang=None, n=100),   # NULL predicate -> fails rule 1
            Row(id=5, lang="en", n=3),     # fails rule 0 (first failure wins)
        ]
    )


def _rules():
    from pyspark.sql import functions as F

    return [("too_small", F.col("n") >= 10), ("non_en", F.col("lang") == "en")]


def test_drop_reason_first_failure_and_null(spark):
    df = _funnel_docs(spark)
    got = {
        r["id"]: r["reason"]
        for r in df.select("id", drop_reason(_rules()).alias("reason")).collect()
    }
    assert got == {1: "kept", 2: "too_small", 3: "non_en", 4: "non_en", 5: "too_small"}


def test_filter_funnel_counts(spark):
    rows = {
        r["rule"]: r for r in filter_funnel(_funnel_docs(spark), _rules()).collect()
    }
    assert rows["too_small"]["stage"] == 0
    assert (rows["too_small"]["n_in"], rows["too_small"]["n_dropped"],
            rows["too_small"]["n_out"]) == (5, 2, 3)
    assert (rows["non_en"]["n_in"], rows["non_en"]["n_dropped"],
            rows["non_en"]["n_out"]) == (3, 2, 1)


def test_filter_funnel_zero_drop_rule_present(spark):
    from pyspark.sql import functions as F

    rules = [("never", F.lit(True)), ("too_small", F.col("n") >= 10)]
    rows = {r["rule"]: r for r in filter_funnel(_funnel_docs(spark), rules).collect()}
    assert rows["never"]["n_dropped"] == 0 and rows["never"]["n_in"] == 5
    assert rows["too_small"]["n_dropped"] == 2


def test_filter_funnel_empty_input(spark):
    df = _funnel_docs(spark).filter("n < 0")
    rows = filter_funnel(df, _rules()).collect()
    assert [(r["n_in"], r["n_dropped"], r["n_out"]) for r in rows] == [(0, 0, 0)] * 2


def test_drop_reason_validation():
    from pyspark.sql import functions as F

    import pytest as _pytest

    with _pytest.raises(ValueError):
        drop_reason([])
    with _pytest.raises(ValueError):
        drop_reason([("a", F.lit(True)), ("a", F.lit(True))])
    with _pytest.raises(ValueError):
        drop_reason([("kept", F.lit(True))])


# ------------------------------------------------------------- MAD outliers
def test_outliers_mad_flags_and_degenerate_group(spark):
    from pyspark.sql import Row

    from pandance_spark.functions.profile import outliers_mad

    rows = (
        [Row(id=i, g="n", v=float(10 + (i % 5))) for i in range(20)]  # 10..14
        + [Row(id=99, g="n", v=1000.0)]                               # outlier
        + [Row(id=200 + i, g="flat", v=5.0) for i in range(4)]        # MAD=0
        + [Row(id=299, g="flat", v=5.5)]
    )
    out = {
        r["id"]: r
        for r in outliers_mad(spark.createDataFrame(rows), "g", "v").collect()
    }
    assert out[99]["is_outlier"] is True
    assert all(not out[i]["is_outlier"] for i in range(20))
    # degenerate group: MAD 0 -> only the value differing from median
    assert out[299]["is_outlier"] is True and out[299]["grp_mad"] == 0.0
    assert all(not out[200 + i]["is_outlier"] for i in range(4))
    # median/MAD hand-check for the normal group (21 values)
    import statistics

    vals = [10.0 + (i % 5) for i in range(20)] + [1000.0]
    med = statistics.median(vals)
    mad = statistics.median(sorted(abs(x - med) for x in vals))
    assert out[99]["grp_median"] == med and out[99]["grp_mad"] == mad


def test_outliers_mad_validation(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from pandance_spark.functions.profile import outliers_mad

    df = spark.createDataFrame([Row(g="a", v=1.0, grp_mad=2.0)])
    with _pytest.raises(ValueError, match="collide"):
        outliers_mad(df, "g", "v")
    df2 = spark.createDataFrame([Row(g="a", v=1.0)])
    with _pytest.raises(ValueError):
        outliers_mad(df2, "g", "v", k=0)


def test_psi_drift_identical_and_shifted(spark):
    import math

    from pyspark.sql import functions as F

    from pandance_spark.functions.profile import psi_drift

    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], ["v"]
    )
    feats = {"v": (F.col("v"), [2.0, 5.0, 8.0])}
    # identical snapshots: every psi_term is exactly 0
    same = psi_drift(ref, ref, feats).collect()
    assert same and all(r["psi_term"] == 0.0 for r in same)
    assert all(r["n_ref"] == r["n_cur"] for r in same)
    # shifted snapshot: positive PSI, totals normalize per side
    cur = spark.createDataFrame(
        [(float(i % 10) + 4.0,) for i in range(50)], ["v"]
    )
    rows = psi_drift(ref, cur, feats).collect()
    psi = sum(r["psi_term"] for r in rows)
    assert psi > 0.1
    assert abs(sum(r["p_ref"] for r in rows) - 1.0) < 1e-6
    # zero-protection: a bin empty on one side uses the eps floor, so
    # the term is finite
    assert all(math.isfinite(r["psi_term"]) for r in rows)
    # NULL/NaN excluded
    withnull = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),)], ["v"]
    )
    r2 = psi_drift(withnull, withnull, feats).collect()
    assert sum(r["n_ref"] for r in r2) == 1


def test_psi_drift_empty_side_under_ansi(spark):
    """A snapshot with zero non-null rows for a feature used to hit
    n/0 — NULL silently clamped to eps under default config but
    DIVIDE_BY_ZERO under ANSI mode (Spark 4.x default; ADVICE r8).
    The guarded ratio must degrade to the eps floor in BOTH modes."""
    import math

    from pyspark.sql import functions as F

    from pandance_spark.functions.profile import psi_drift

    ref = spark.createDataFrame([(float(i % 10),) for i in range(60)], ["v"])
    empty_cur = spark.createDataFrame([(None,)], "v double")
    feats = {"v": (F.col("v"), [2.0, 5.0, 8.0])}
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    try:
        for mode in ("false", "true"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            rows = psi_drift(ref, empty_cur, feats).collect()
            assert rows, mode
            # cur side empty for the feature: p_cur is the eps floor
            assert all(r["p_cur"] == 1e-06 for r in rows), mode
            assert all(math.isfinite(r["psi_term"]) for r in rows), mode
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.ansi.enabled", prev)
        else:
            spark.conf.unset("spark.sql.ansi.enabled")


def test_benford_profile_exact_counts(spark):
    """Hand-checkable Benford panel: digit extraction from the integer
    part, absent digits present with n=0, fractions and chi-square
    contributions replaying the closed form."""
    import math

    from pandance_spark.functions.profile import (
        BENFORD_EXPECTED,
        benford_profile,
    )

    vals = [1.2, 19.0, 150.0, 1999.9, 2.5, 31.4, 0.4, None, -5.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {r["digit"]: r for r in benford_profile(df, "x").collect()}
    assert set(got) == set(range(1, 10))
    # qualifying rows: 1.2, 19.0, 150.0, 1999.9 -> digit 1 (x4);
    # 2.5 -> 2; 31.4 -> 3; 0.4/None/-5.0 dropped
    assert got[1]["n"] == 4 and got[2]["n"] == 1 and got[3]["n"] == 1
    assert got[9]["n"] == 0
    assert abs(got[1]["obs_frac"] - round(4 / 6, 9)) < 1e-12
    assert got[1]["exp_frac"] == round(BENFORD_EXPECTED[1], 9)
    exp = BENFORD_EXPECTED[9]
    assert abs(got[9]["chi2_contrib"] - round(exp, 9)) < 1e-9
    # non-finite and bigint-overflow values dropped (DuckDB would
    # error on the cast Spark silently clamps)
    messy = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (1e19,), (2.0,)], ["x"]
    )
    got2 = {r["digit"]: r["n"] for r in benford_profile(messy, "x").collect()}
    assert got2[2] == 1 and sum(got2.values()) == 1
