"""salted_join equals the plain join and spreads hot keys."""

import pytest
from pyspark.sql import functions as F

from pandance_spark.operators.skew import salted_join


def test_salted_equals_plain_inner_and_left(spark):
    # 80% of left rows share one hot key
    left = spark.createDataFrame(
        [(0 if i % 5 != 4 else i, i) for i in range(500)], "k long, lv long"
    )
    right = spark.createDataFrame(
        [(i % 20, 1000 + i) for i in range(60)], "k long, rv long"
    )
    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        salted = salted_join(left, right, "k", n_salts=8, how=how)
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_duplicate_rows_multiplicity(spark):
    # duplicate left rows and duplicate right rows: pair multiplicity
    # must match the plain join exactly
    left = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], "k long, lv string")
    right = spark.createDataFrame([(1, "x"), (1, "x")], "k long, rv string")
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", n_salts=4).collect()))
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    left = spark.createDataFrame([(0, i) for i in range(1000)], "k long, lv long")
    salted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(8)),
    )
    counts = [r["c"] for r in salted.groupBy("__salt").agg(F.count("*").alias("c")).collect()]
    assert len(counts) == 8  # every salt bucket hit
    assert max(counts) < 1000 * 0.3  # no bucket holds the hot key alone


def test_salted_join_validation(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", n_salts=0)
    with pytest.raises(ValueError):
        salted_join(df, df, "nope")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")
