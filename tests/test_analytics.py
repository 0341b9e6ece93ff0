"""Funnels and cohort retention (functions/analytics.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandance_spark.functions.analytics import (
    cohort_retention,
    funnel_steps,
    funnel_summary,
)

T = dt.datetime
STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id int, ts timestamp, step string")


def test_funnel_order_matters(spark):
    ev = _ev(
        spark,
        [
            # full funnel in order
            (1, T(2024, 1, 1, 0, 0), "view"),
            (1, T(2024, 1, 1, 0, 5), "click"),
            (1, T(2024, 1, 1, 0, 9), "purchase"),
            # click before view doesn't count; later click does
            (2, T(2024, 1, 1, 0, 0), "click"),
            (2, T(2024, 1, 1, 0, 2), "view"),
            (2, T(2024, 1, 1, 0, 4), "click"),
            # purchase first: stuck at view
            (3, T(2024, 1, 1, 0, 0), "purchase"),
            (3, T(2024, 1, 1, 0, 1), "view"),
            # irrelevant step only: excluded from output
            (5, T(2024, 1, 1, 0, 0), "signup"),
        ],
    )
    got = {
        r["user_id"]: (r["steps_reached"], r["last_step"])
        for r in funnel_steps(ev, "user_id", "ts", "step", STEPS).collect()
    }
    assert got == {1: (3, "purchase"), 2: (2, "click"), 3: (1, "view")}


def test_funnel_strictly_after_ties_do_not_advance(spark):
    ev = _ev(
        spark,
        [
            (4, T(2024, 1, 1, 0, 0), "view"),
            (4, T(2024, 1, 1, 0, 0), "click"),  # same instant: no advance
            (6, T(2024, 1, 1, 0, 0), "view"),
            (6, T(2024, 1, 1, 0, 1), "click"),
            (6, T(2024, 1, 1, 0, 1), "purchase"),  # tied with click: no
        ],
    )
    got = {
        r["user_id"]: r["steps_reached"]
        for r in funnel_steps(ev, "user_id", "ts", "step", STEPS).collect()
    }
    assert got == {4: 1, 6: 2}


def test_funnel_summary_cumulative(spark):
    ev = _ev(
        spark,
        [
            (1, T(2024, 1, 1), "view"),
            (2, T(2024, 1, 1), "view"),
            (2, T(2024, 1, 2), "click"),
        ],
    )
    fu = funnel_steps(ev, "user_id", "ts", "step", STEPS)
    rows = {
        r["step_idx"]: (r["step"], r["users"])
        for r in funnel_summary(fu, STEPS).collect()
    }
    assert rows == {1: ("view", 2), 2: ("click", 1), 3: ("purchase", 0)}


def test_funnel_validation(spark):
    ev = _ev(spark, [(1, T(2024, 1, 1), "view")])
    with pytest.raises(ValueError, match="non-empty"):
        funnel_steps(ev, "user_id", "ts", "step", [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(ev, "user_id", "ts", "step", ["a", "a"])


def test_cohort_retention_matrix(spark):
    w = 3600  # hourly cohorts
    ev = _ev(
        spark,
        [
            # u1 first in hour 0, active hours 0 and 2 (twice: distinct)
            (1, T(2024, 1, 1, 0, 10), "x"),
            (1, T(2024, 1, 1, 2, 10), "x"),
            (1, T(2024, 1, 1, 2, 50), "x"),
            # u2 first in hour 0 only
            (2, T(2024, 1, 1, 0, 30), "x"),
            # u3 first in hour 2
            (3, T(2024, 1, 1, 2, 0), "x"),
        ],
    )
    got = {
        (r["cohort_s"], r["offset"]): r["users"]
        for r in cohort_retention(ev, "user_id", "ts", w).collect()
    }
    h0 = int(T(2024, 1, 1, 0).replace(tzinfo=dt.timezone.utc).timestamp())
    h2 = h0 + 2 * w
    assert got == {(h0, 0): 2, (h0, 2): 1, (h2, 0): 1}
    with pytest.raises(ValueError, match="width_seconds"):
        cohort_retention(ev, "user_id", "ts", 0)


def test_rollup_distinct_merge_within_error(spark):
    from pandance_spark.operators.rollup import (
        build_rollup_distinct,
        finalize_rollup_distinct,
        merge_rollup_distinct,
    )

    ev = spark.range(20000).select(
        F.timestamp_seconds(F.col("id") % 3600).alias("ts"),
        (F.col("id") % 1000).alias("uid"),
        F.lit("a").alias("k"),
    )
    scratch = finalize_rollup_distinct(
        build_rollup_distinct(ev, "ts", 3600, ["k"], "uid")
    ).collect()[0]["approx_distinct"]
    a = build_rollup_distinct(ev.filter("id % 2 = 0"), "ts", 3600, ["k"], "uid")
    b = build_rollup_distinct(ev.filter("id % 2 = 1"), "ts", 3600, ["k"], "uid")
    merged = finalize_rollup_distinct(merge_rollup_distinct(a, b)).collect()[0][
        "approx_distinct"
    ]
    # both within the lg_k=12 error bound of exact and of each other
    assert abs(scratch - 1000) / 1000 < 0.05
    assert abs(merged - 1000) / 1000 < 0.05
    assert abs(merged - scratch) / 1000 < 0.04
    with pytest.raises(ValueError, match="lg_k"):
        build_rollup_distinct(ev, "ts", 3600, ["k"], "uid", lg_k=2)


def test_funnel_ignores_null_users(spark):
    ev = _ev(
        spark,
        [
            (None, T(2024, 1, 1, 0, 0), "view"),
            (None, T(2024, 1, 1, 0, 1), "click"),
            (7, T(2024, 1, 1, 0, 0), "view"),
        ],
    )
    got = {
        r["user_id"]: r["steps_reached"]
        for r in funnel_steps(ev, "user_id", "ts", "step", STEPS).collect()
    }
    assert got == {7: 1}


def test_cumulative_users_curve(spark):
    from pandance_spark.functions.analytics import cumulative_users

    ev = _ev(
        spark,
        [
            (1, T(2024, 1, 1, 0, 0), "x"),   # day 0: u1, u2 new
            (2, T(2024, 1, 1, 5, 0), "x"),
            (1, T(2024, 1, 3, 0, 0), "x"),   # day 2: u1 returns (not new)
            (3, T(2024, 1, 3, 1, 0), "x"),   # day 2: u3 new; day 1 is a gap
        ],
    )
    rows = [
        (r["period_s"], r["new_users"], r["cum_users"])
        for r in cumulative_users(ev, "user_id", "ts", 86400)
        .orderBy("period_s")
        .collect()
    ]
    d0 = int(T(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert rows == [
        (d0, 2, 2),
        (d0 + 86400, 0, 2),      # gap day carried at 0
        (d0 + 2 * 86400, 1, 3),
    ]
    with pytest.raises(ValueError, match="width_seconds"):
        cumulative_users(ev, "user_id", "ts", 0)


def test_step_transitions_matrix(spark):
    from pandance_spark.functions.analytics import step_transitions

    ev = _ev(
        spark,
        [
            (1, T(2024, 1, 1, 0, 0), "view"),
            (1, T(2024, 1, 1, 0, 1), "click"),
            (1, T(2024, 1, 1, 0, 2), "view"),
            (2, T(2024, 1, 1, 0, 0), "view"),
            (2, T(2024, 1, 1, 0, 1), "click"),
            (None, T(2024, 1, 1, 0, 2), "view"),  # excluded
        ],
    )
    got = {
        (r["from_step"], r["to_step"]): (r["n_transitions"], r["n_users"])
        for r in step_transitions(ev, "user_id", "ts", "step").collect()
    }
    assert got == {
        ("view", "click"): (2, 2),
        ("click", "view"): (1, 1),
    }


def test_ab_summary_counts_and_z(spark):
    from pandance_spark.functions.analytics import ab_summary

    ev = spark.createDataFrame(
        [
            (1, "a", True), (1, "a", False),   # unit 1 converts (any-row)
            (2, "a", False),
            (3, "b", True),
            (4, "b", True),
            (None, "a", True),                 # excluded
        ],
        "uid int, arm string, ok boolean",
    )
    got = {
        r["arm"]: (r["n_units"], r["n_converted"], r["rate"])
        for r in ab_summary(ev, "uid", "arm", F.col("ok")).collect()
    }
    assert got == {"a": (2, 1, 0.5), "b": (2, 2, 1.0)}
    # z is symmetric-ish around the pooled rate: signs differ
    rows = {r["arm"]: r["z_vs_pooled"] for r in
            ab_summary(ev, "uid", "arm", F.col("ok")).collect()}
    assert rows["a"] < 0 < rows["b"]


def test_trimmed_stats_exact_and_edges(spark):
    """Trimmed/winsorized means against hand-computed values, the
    n <= 2t fallback, tie interchangeability, and the trim_frac
    domain guard."""
    import pytest

    from pandance_spark.functions.analytics import trimmed_stats

    rows = (
        [("a", float(v)) for v in [1, 2, 3, 4, 100]]   # one spike
        + [("b", 5.0)]                                  # n=1: fallback
        + [("c", float(v)) for v in [7, 7, 7, 7, 7, 700]]  # ties
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["group"]: r for r in
           trimmed_stats(df, "g", "v", trim_frac=0.2).collect()}
    # a: n=5, t=1 -> keep [2,3,4]; winsor: (2+3+4 + 2 + 4)/5 = 3.0
    assert got["a"]["n"] == 5 and got["a"]["n_trimmed"] == 2
    assert abs(got["a"]["trimmed_mean"] - 3.0) < 1e-9
    assert abs(got["a"]["winsor_mean"] - 3.0) < 1e-9
    # b: n=1 <= 2t -> untrimmed
    assert got["b"]["n_trimmed"] == 0
    assert abs(got["b"]["trimmed_mean"] - 5.0) < 1e-9
    assert abs(got["b"]["winsor_mean"] - 5.0) < 1e-9
    # c: n=6, t=1 -> drop one 7 and the 700: mean of four 7s = 7;
    # winsor: (28 + 7 + 7)/6 = 7
    assert abs(got["c"]["trimmed_mean"] - 7.0) < 1e-9
    assert abs(got["c"]["winsor_mean"] - 7.0) < 1e-9

    with pytest.raises(ValueError, match="trim_frac"):
        trimmed_stats(df, "g", "v", trim_frac=0.5)

    # NaN/Inf rows are dropped, not silently snapped (Spark casts
    # NaN->0 where DuckDB errors — the population must match)
    messy = spark.createDataFrame(
        [("m", 1.0), ("m", 2.0), ("m", float("nan")),
         ("m", float("inf")), ("m", None)],
        ["g", "v"],
    )
    r = trimmed_stats(messy, "g", "v", trim_frac=0.1).collect()[0]
    assert r["n"] == 2 and abs(r["trimmed_mean"] - 1.5) < 1e-9
