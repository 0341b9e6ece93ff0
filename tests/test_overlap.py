"""overlap_join tests — band form vs conditional form vs brute force."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandance_spark.operators.overlap import overlap_join
from pandance_spark.sources import load_table


def test_overlap_golden(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 20, 30), (3, 5, 25)], "id long, s long, e long"
    )
    right = spark.createDataFrame(
        [(10, 8, 12), (20, 28, 40), (30, 50, 60)], "id long, s long, e long"
    )
    expected = {(1, 10), (3, 10), (2, 20)}  # [5,25] vs [28,40] do NOT meet
    for strategy in ("bnl", "band"):
        out = overlap_join(
            left, right, "s", "e", "s", "e", strategy=strategy, num_bands=4
        )
        got = {(r["id_x"], r["id_y"]) for r in out.collect()}
        assert got == expected, strategy


def test_overlap_closed_bounds_touching(spark):
    # closed intervals: touching endpoints DO overlap
    left = spark.createDataFrame([(1, 0, 10)], "id long, s long, e long")
    right = spark.createDataFrame([(2, 10, 20)], "id long, s long, e long")
    for strategy in ("bnl", "band"):
        assert (
            overlap_join(left, right, "s", "e", "s", "e", strategy=strategy).count()
            == 1
        )


def test_overlap_band_equals_bnl_on_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    # intervals [ts, ts + value minutes]
    iv = ev.select(
        "event_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.make_dt_interval(mins=F.col("value"))).alias("end"),
    )
    a = iv.filter(F.col("event_id") % 13 == 0)
    b = iv.filter(F.col("event_id") % 13 == 1)
    bnl = overlap_join(a, b, "start", "end", "start", "end", strategy="bnl")
    band = overlap_join(
        a, b, "start", "end", "start", "end", strategy="band", num_bands=16
    )
    key = ["event_id_x", "event_id_y"]
    got_bnl = {tuple(r[c] for c in key) for r in bnl.collect()}
    got_band = {tuple(r[c] for c in key) for r in band.collect()}
    assert got_bnl == got_band
    assert len(got_band) > 0
    for r in band.collect():
        assert r["start_x"] <= r["end_y"] and r["start_y"] <= r["end_x"]


def test_overlap_no_duplicate_pairs_across_bands(spark):
    # one long interval spanning every band must still match each right
    # interval exactly once
    left = spark.createDataFrame([(1, 0, 1000)], "id long, s long, e long")
    right = spark.createDataFrame(
        [(i, i * 10, i * 10 + 5) for i in range(100)], "id long, s long, e long"
    )
    out = overlap_join(left, right, "s", "e", "s", "e", strategy="band", num_bands=8)
    rows = out.collect()
    assert len(rows) == 100  # each exactly once
    assert len({r["id_y"] for r in rows}) == 100


def test_overlap_validation(spark):
    df = spark.createDataFrame([(1, 2)], "s long, e long")
    with pytest.raises(ValueError):
        overlap_join(df, df, "s", "nope", "s", "e")
