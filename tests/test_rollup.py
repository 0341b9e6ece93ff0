"""Continuous-aggregate rollup maintenance (operators/rollup.py)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandance_spark.operators.rollup import (
    build_rollup,
    finalize_rollup,
    merge_rollup,
    time_bucket,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(ts=dt.datetime(2024, 1, 1, h, m), k=k, v=v)
            for h, m, k, v in rows
        ]
    )


def test_time_bucket_floors(spark):
    df = spark.createDataFrame([Row(ts=dt.datetime(2024, 1, 1, 1, 59, 59))])
    got = df.select(time_bucket(F.col("ts"), 3600).alias("b")).collect()[0]["b"]
    assert got == dt.datetime(2024, 1, 1, 1, 0, 0)
    with pytest.raises(ValueError):
        time_bucket(F.col("ts"), 0)


def test_merge_equals_from_scratch(spark):
    rows = [(h, m, k, float(h * 10 + m)) for h in range(3) for m in (0, 30) for k in ("a", "b")]
    full = _ev(spark, rows)
    part1 = _ev(spark, rows[::2])
    part2 = _ev(spark, rows[1::2])
    scratch = build_rollup(full, "ts", 3600, ["k"], "v")
    merged = merge_rollup(
        build_rollup(part1, "ts", 3600, ["k"], "v"),
        build_rollup(part2, "ts", 3600, ["k"], "v"),
    )
    a = sorted(map(tuple, finalize_rollup(scratch, 6).collect()))
    b = sorted(map(tuple, finalize_rollup(merged, 6).collect()))
    assert a == b and len(a) == 6  # 3 hours x 2 keys


def test_merge_is_order_insensitive_and_idempotent_shape(spark):
    rows = [(0, 0, "a", 1.0), (0, 30, "a", 2.0), (1, 0, "a", 3.0)]
    r1 = build_rollup(_ev(spark, rows[:1]), "ts", 3600, ["k"], "v")
    r2 = build_rollup(_ev(spark, rows[1:]), "ts", 3600, ["k"], "v")
    ab = sorted(map(tuple, merge_rollup(r1, r2).collect()))
    ba = sorted(map(tuple, merge_rollup(r2, r1).collect()))
    assert ab == ba
    # untouched bucket passes through unchanged
    h1 = [r for r in ab if r[0] == dt.datetime(2024, 1, 1, 1)]
    assert h1 == [(dt.datetime(2024, 1, 1, 1), "a", 1, 3.0, 3.0, 3.0)]


def test_null_values_carry_no_information(spark):
    df = spark.createDataFrame(
        [
            Row(ts=dt.datetime(2024, 1, 1, 0, 0), k="a", v=None),
            Row(ts=dt.datetime(2024, 1, 1, 0, 5), k="a", v=4.0),
            Row(ts=dt.datetime(2024, 1, 1, 1, 0), k="a", v=None),
        ]
    )
    rows = {r["bucket"]: r for r in build_rollup(df, "ts", 3600, ["k"], "v").collect()}
    # hour 0: one non-null value; hour 1 (all-null) dropped entirely
    assert list(rows) == [dt.datetime(2024, 1, 1, 0)]
    assert (rows[dt.datetime(2024, 1, 1, 0)]["cnt"],
            rows[dt.datetime(2024, 1, 1, 0)]["v_sum"]) == (1, 4.0)


def test_schema_validation(spark):
    df = _ev(spark, [(0, 0, "a", 1.0)])
    with pytest.raises(ValueError, match="collide"):
        build_rollup(df.withColumnRenamed("v", "cnt"), "ts", 3600, ["k"], "cnt")
    r = build_rollup(df, "ts", 3600, ["k"], "v")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_rollup(r, r.drop("v_max"))
