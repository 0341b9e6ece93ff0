"""SCD2 history/apply: brute-force Python oracle + plan shape."""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandance_spark.operators.scd import scd2_apply, scd2_history


def _ts(day, h=0):
    return dt.datetime(2024, 1, day, h)


@pytest.fixture()
def log(spark):
    rows = [
        # user 1: a -> a (dup, collapses) -> b -> a
        (1, "a", _ts(1), 10),
        (1, "a", _ts(2), 11),
        (1, "b", _ts(3), 12),
        (1, "a", _ts(4), 13),
        # user 2: single state
        (2, "x", _ts(1), 14),
        # user 3: null handling — null -> null collapses, null -> c changes
        (3, None, _ts(1), 15),
        (3, None, _ts(2), 16),
        (3, "c", _ts(3), 17),
    ]
    return spark.createDataFrame(rows, "uid long, state string, ts timestamp, eid long")


def test_scd2_history_intervals(spark, log):
    out = scd2_history(log, ["uid"], ["state"], "ts", order_cols=["eid"])
    got = {
        (r["uid"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, "a", _ts(1), _ts(3), False),
        (1, "b", _ts(3), _ts(4), False),
        (1, "a", _ts(4), None, True),
        (2, "x", _ts(1), None, True),
        (3, None, _ts(1), _ts(3), False),
        (3, "c", _ts(3), None, True),
    }


def test_scd2_history_single_exchange(spark, log):
    plan = scd2_history(log, ["uid"], ["state"], "ts")._jdf.queryExecution().executedPlan().toString()
    # both windows must share ONE hash exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_history_multi_attr_and_key(spark):
    rows = [
        ("k1", "p", 1, _ts(1)),
        ("k1", "p", 2, _ts(2)),   # second attr changed -> new version
        ("k1", "p", 2, _ts(3)),   # unchanged -> collapses
    ]
    df = spark.createDataFrame(rows, "k string, a1 string, a2 int, ts timestamp")
    out = scd2_history(df, ["k"], ["a1", "a2"], "ts")
    got = {(r["k"], r["a1"], r["a2"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert got == {
        ("k1", "p", 1, _ts(1), _ts(2)),
        ("k1", "p", 2, _ts(2), None),
    }


def test_scd2_apply_merge_and_idempotence(spark, log):
    dim = scd2_history(log, ["uid"], ["state"], "ts", order_cols=["eid"])
    updates = spark.createDataFrame(
        [
            (1, "c", _ts(5)),   # new state for user 1 -> close open interval
            (2, "x", _ts(5)),   # same state as current -> no new version
            (4, "new", _ts(5)), # brand-new key
        ],
        "uid long, state string, ts timestamp",
    )
    merged = scd2_apply(dim, updates, ["uid"], ["state"], "ts")
    got = {
        (r["uid"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in merged.collect()
    }
    assert (1, "a", _ts(4), _ts(5), False) in got
    assert (1, "c", _ts(5), None, True) in got
    assert (2, "x", _ts(1), None, True) in got      # no spurious version
    assert (4, "new", _ts(5), None, True) in got
    assert len([r for r in got if r[0] == 2]) == 1

    # idempotent: applying the same batch to the merged table is a no-op
    again = scd2_apply(merged, updates, ["uid"], ["state"], "ts")
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in merged.collect()}


def test_scd2_apply_late_arrival_splices(spark):
    dim = scd2_history(
        spark.createDataFrame(
            [(1, "a", _ts(1)), (1, "c", _ts(5))], "uid long, state string, ts timestamp"
        ),
        ["uid"], ["state"], "ts",
    )
    late = spark.createDataFrame([(1, "b", _ts(3))], "uid long, state string, ts timestamp")
    out = scd2_apply(dim, late, ["uid"], ["state"], "ts")
    got = {(r["state"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert got == {
        ("a", _ts(1), _ts(3)),
        ("b", _ts(3), _ts(5)),
        ("c", _ts(5), None),
    }


def test_scd2_output_name_collision(spark, log):
    with pytest.raises(ValueError):
        scd2_history(log, ["uid"], ["state"], "ts", valid_from="state")


def test_scd2_apply_order_cols_tiebreak(spark):
    # two equal-ts observations within one batch: eid tie-break orders
    # them; an established version at the same ts sorts before updates
    dim = scd2_history(
        spark.createDataFrame(
            [(1, "a", _ts(1), 0)], "uid long, state string, ts timestamp, eid long"
        ),
        ["uid"], ["state"], "ts", order_cols=["eid"],
    )
    batch = spark.createDataFrame(
        [(1, "b", _ts(2), 5), (1, "c", _ts(2), 6)],
        "uid long, state string, ts timestamp, eid long",
    )
    out = scd2_apply(dim, batch, ["uid"], ["state"], "ts", order_cols=["eid"])
    got = {(r["state"], r["valid_from"], r["is_current"]) for r in out.collect()}
    assert got == {
        ("a", _ts(1), False),
        ("b", _ts(2), False),
        ("c", _ts(2), True),
    }
