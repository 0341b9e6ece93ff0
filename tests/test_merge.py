"""merge_upsert: update/insert/delete matrix + column precedence."""

import pytest
from pyspark.sql import functions as F

from pandance_spark.operators.merge import merge_upsert


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_update_and_insert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, tag string, v double",
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id long, tag string, v double"
    )
    out = merge_upsert(target, source, ["id"])
    assert _rows(out) == {
        (1, "a", 10.0),
        (2, "B", 200.0),  # updated
        (3, "c", 30.0),
        (4, "d", 40.0),  # inserted
    }


def test_update_subset_of_columns(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0)], "id long, tag string, v double"
    )
    source = spark.createDataFrame(
        [(1, "Z", 99.0)], "id long, tag string, v double"
    )
    out = merge_upsert(target, source, ["id"], update_cols=["v"])
    assert _rows(out) == {(1, "a", 99.0)}  # tag kept, v updated


def test_no_insert_and_delete_missing(spark):
    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double"
    )
    source = spark.createDataFrame([(2, 200.0), (9, 90.0)], "id long, v double")
    out = merge_upsert(target, source, ["id"], insert_unmatched=False)
    assert _rows(out) == {(1, 10.0), (2, 200.0)}
    out2 = merge_upsert(target, source, ["id"], delete_missing=True)
    assert _rows(out2) == {(2, 200.0), (9, 90.0)}  # 1 deleted, 9 inserted


def test_composite_keys_and_validation(spark):
    target = spark.createDataFrame(
        [(1, "x", 5.0), (1, "y", 6.0)], "a long, b string, v double"
    )
    source = spark.createDataFrame([(1, "y", 60.0)], "a long, b string, v double")
    out = merge_upsert(target, source, ["a", "b"])
    assert _rows(out) == {(1, "x", 5.0), (1, "y", 60.0)}
    with pytest.raises(ValueError):
        merge_upsert(target, source, [])
    with pytest.raises(ValueError):
        merge_upsert(target, source, ["nope"])


def test_single_shuffle_plan(spark):
    target = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double")
    source = spark.createDataFrame([(i, -float(i)) for i in range(50, 150)], "id long, v double")
    out = merge_upsert(target, source, ["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one join, no Cartesian/BNLJ
    assert plan.count("Join") >= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 150


def test_table_diff(spark):
    from pandance_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged -> omitted
            (2, "B", 20.0),      # changed: s
            (3, "c", 30.0),      # changed: v (NULL -> value)
            (5, "e", 50.0),      # added
        ],                        # 4 removed
        "k int, s string, v double",
    )
    got = {
        r["k"]: (r["change"], sorted(r["changed_cols"]))
        for r in table_diff(old, new, "k").collect()
    }
    assert got == {
        2: ("changed", ["s"]),
        3: ("changed", ["v"]),
        4: ("removed", []),
        5: ("added", []),
    }
    # compare_cols restriction: s-only diff ignores the v change
    got2 = {
        r["k"]: r["change"]
        for r in table_diff(old, new, "k", compare_cols=["s"]).collect()
    }
    assert got2 == {2: "changed", 4: "removed", 5: "added"}


def test_apply_changes_net_effect(spark):
    from pandance_spark.operators.merge import apply_changes

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    ch = spark.createDataFrame(
        [
            # k=1: upsert v1 then delete v2 -> gone
            (1, "a", 11.0, "U", 1), (1, "a", 12.0, "D", 2),
            # k=2: delete v1 then upsert v2 -> the upsert wins
            (2, "b", 0.0, "D", 1), (2, "b", 21.0, "U", 2),
            # k=4: pure insert
            (4, "d", 40.0, "U", 1),
            # k=3 untouched
        ],
        "k int, s string, v double, op string, ver int",
    )
    got = sorted(
        map(tuple, apply_changes(snap, ch, ["k"], "ver").collect())
    )
    assert got == [(2, "b", 21.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_apply_changes_null_op_is_upsert_and_validation(spark):
    from pandance_spark.operators.merge import apply_changes

    snap = spark.createDataFrame([(1, 1.0)], "k int, v double")
    ch = spark.createDataFrame([(1, 2.0, None, 1)],
                               "k int, v double, op string, ver int")
    assert apply_changes(snap, ch, ["k"], "ver").collect()[0]["v"] == 2.0
    import pytest as _pt
    with _pt.raises(ValueError, match="missing column"):
        apply_changes(snap, ch.drop("ver"), ["k"], "ver")
    with _pt.raises(ValueError, match="missing snapshot columns"):
        apply_changes(snap.withColumn("extra", snap.k), ch, ["k"], "ver")


def test_apply_changes_delete_upsert_tie_is_deterministic(spark):
    from pandance_spark.operators.merge import apply_changes

    snap = spark.createDataFrame([(1, None)], "k int, v double")
    # same key, same version, same payload; only op differs — the tie
    # hash must separate them, and do so identically however the data
    # is partitioned
    ch = spark.createDataFrame(
        [(1, None, "U", 1), (1, None, "D", 1)],
        "k int, v double, op string, ver int",
    )
    results = set()
    for parts in (1, 7):
        out = apply_changes(snap, ch.repartition(parts), ["k"], "ver")
        results.add(tuple(sorted(map(tuple, out.collect()))))
    assert len(results) == 1, results
