"""plan_report / assert_scalable (plans/report.py): plan-structure
introspection and the CI scale gate."""

import pytest
from pyspark.sql import functions as F

from pandance_spark.plans.report import assert_scalable, plan_report
from pandance_spark.sources import load_table


def test_plan_report_counts_and_pushdown(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    df = (
        part.filter(F.col("p_retailprice") > 910)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rep = plan_report(df)
    assert rep["exchanges"] == 1  # the one groupBy shuffle
    assert rep["scans"] >= 1
    assert rep["cartesian_products"] == 0
    # the filter reached the parquet scan
    assert any("p_retailprice" in f for f in rep["pushed_filters"])
    # codegen markers exist on the non-adaptive (exchange-free) plan;
    # an unexecuted AQE plan hides them (documented in plan_report)
    no_aqe = part.filter(F.col("p_retailprice") > 910)
    assert plan_report(no_aqe)["wholestage_codegen_stages"] >= 1


def test_assert_scalable_passes_clean_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    df = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    # a broadcast join is ZERO shuffles: BroadcastExchange must not
    # count against the exchange budget
    rep = assert_scalable(df, max_exchanges=0)
    assert rep["broadcast_hash_joins"] == 1
    assert rep["exchanges"] == 0 and rep["broadcast_exchanges"] >= 1


def test_assert_scalable_flags_cartesian(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").limit(10)
    nat = load_table(spark, sf_dir, "nation")
    cross = cust.crossJoin(nat)
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scalable(cross)
    # the theta-join opt-in
    assert_scalable(cross, allow_cartesian=True)
    # a deliberate small-broadcast non-equi join: allow_bnlj waives
    # only the BNLJ while a true CartesianProduct would still fail
    assert_scalable(cross, allow_bnlj=True)


def test_assert_scalable_exchange_budget(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    two_shuffles = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .orderBy("s")
    )
    with pytest.raises(AssertionError, match="max_exchanges"):
        assert_scalable(two_shuffles, max_exchanges=1)
    assert_scalable(two_shuffles, max_exchanges=5)


def test_assert_scalable_python_stages(spark):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def plus1(s: pd.Series) -> pd.Series:
        return s + 1

    df = spark.range(10).select(plus1(F.col("id")).alias("x"))
    rep = assert_scalable(df)  # Arrow stages pass by default
    assert rep["arrow_evals"] == 1
    with pytest.raises(AssertionError, match="Python stage"):
        assert_scalable(df, allow_python=False)
