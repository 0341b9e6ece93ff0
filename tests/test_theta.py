"""theta_join correctness (FIXTURES.md T1-T4; reference test/test_ops.py:182-248,412-450)."""

import math
import warnings

import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F

from pandance_spark import theta_join


def rows_set(df, cols=None):
    cols = cols or df.columns
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


@pytest.fixture(scope="module")
def keyed(spark):
    # FIXTURES T1 (reference test_ops.py:182-216)
    left = spark.createDataFrame(
        [(12, 1.0), (32, 2.0), (35, 3.0), (48, 4.0), (64, 5.0), (73, 6.0)],
        "key long, value_old double",
    )
    right = spark.createDataFrame(
        [(18, 1.5), (30, 2.5), (32, 3.5), (64, 4.5), (78, 5.5), (96, 6.5)],
        "key long, value_new double",
    )
    return left, right


def test_theta_modular_column_path(keyed):
    left, right = keyed
    out = theta_join(
        left,
        right,
        condition=lambda x, y: (x % 32 == 0) & (y % 32 == 0),
        on="key",
    )
    got = rows_set(out, ["key_x", "key_y"])
    assert got == {(32, 32), (32, 64), (32, 96), (64, 32), (64, 64), (64, 96)}


def test_theta_ge_relation(spark):
    # FIXTURES T2 (reference test_ops.py:219-248, docstring pandance.py:456-489)
    left = spark.createDataFrame(
        [("car_a", 20), ("car_b", 30), ("car_c", 50)], "item string, price long"
    )
    right = spark.createDataFrame(
        [("boat_1", 10), ("boat_2", 40), ("boat_3", 60)], "item string, price long"
    )
    out = theta_join(
        left,
        right,
        condition=lambda x, y: x >= y,
        on="price",
        suffixes=("_old", "_new"),
    )
    assert set(out.columns) == {"item_old", "price_old", "item_new", "price_new"}
    got = rows_set(out, ["price_old", "price_new"])
    assert got == {(20, 10), (30, 10), (50, 10), (50, 40)}


def test_theta_substring(spark):
    # FIXTURES T3 (reference test_ops.py:412-426)
    left = spark.createDataFrame([("a",), ("the",), ("xyzzy",)], "keyword string")
    right = spark.createDataFrame(
        [("the cat sat",), ("dogs bark loudly",)], "phrase string"
    )
    out = theta_join(
        left,
        right,
        condition=lambda kw, ph: ph.contains(kw),
        left_on="keyword",
        right_on="phrase",
    )
    got = rows_set(out, ["keyword", "phrase"])
    assert got == {
        ("a", "the cat sat"),
        ("the", "the cat sat"),
        ("a", "dogs bark loudly"),
    }


def test_theta_python_udf_path(spark):
    # FIXTURES T4: a genuinely scalar condition (math.isclose) that
    # cannot run on Columns -> Arrow pandas_udf slow path
    import numpy as np

    rng = np.random.default_rng(42)
    angles = rng.uniform(0, 2 * math.pi, 8)
    left = spark.createDataFrame([(float(math.cos(a)),) for a in angles], "x double")
    right = spark.createDataFrame([(float(math.sin(a)),) for a in angles], "y double")
    out = theta_join(
        left,
        right,
        condition=lambda x, y: math.isclose(x * x + y * y - 1, 0, abs_tol=1e-5),
        left_on="x",
        right_on="y",
    )
    rows = out.collect()
    assert len(rows) >= 8  # each angle pairs with itself at least
    for r in rows:
        assert abs(r["x"] ** 2 + r["y"] ** 2 - 1) <= 1e-5


def test_theta_ready_made_column(keyed):
    left, right = keyed
    cond = (F.col("key_x") + F.col("key_y")) % 2 == 0
    out = theta_join(left, right, condition=cond, on="key")
    for r in out.collect():
        assert (r["key_x"] + r["key_y"]) % 2 == 0
    assert out.count() > 0


def test_theta_deprecated_relation_kwarg(keyed):
    left, right = keyed
    with pytest.warns(DeprecationWarning):
        out = theta_join(left, right, relation=lambda x, y: x == y, on="key")
    assert rows_set(out, ["key_x", "key_y"]) == {(32, 32), (64, 64)}


def test_theta_ignored_parallel_knobs(keyed):
    left, right = keyed
    with pytest.warns(UserWarning):
        out = theta_join(
            left, right, condition=lambda x, y: x == y, on="key", n_processes=4
        )
    assert out.count() == 2


def test_theta_condition_required(keyed):
    left, right = keyed
    with pytest.raises(ValueError):
        theta_join(left, right, on="key")


def test_theta_decimal_invalid_operation_guard(spark):
    # reference _safe_condition (pandance.py:519-526): conditions raising
    # decimal.InvalidOperation mean "no match", not an error
    import decimal

    left = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
    right = spark.createDataFrame([(1.0,), (2.0,)], "y double")

    def cond(x, y):
        with decimal.localcontext() as ctx:
            ctx.traps[decimal.InvalidOperation] = True
            return decimal.Decimal(x).compare_signal(decimal.Decimal(y)) == 0

    out = theta_join(left, right, condition=cond, left_on="x", right_on="y")
    assert rows_set(out, ["x", "y"]) == {(1.0, 1.0)}


def test_theta_fastpath_probe_surfaces_real_bugs(spark):
    # Only TypeError/ValueError/AttributeError during the Column-probe
    # mean "not Column-polymorphic, use the pandas path".  Anything
    # else is a genuine bug in the user's condition and must surface
    # instead of silently degrading to the slow path.
    left = spark.createDataFrame([(1,)], "x long")
    right = spark.createDataFrame([(1,)], "y long")

    def buggy(x, y):
        raise ZeroDivisionError("bug in user condition")

    with pytest.raises(ZeroDivisionError):
        theta_join(left, right, condition=buggy, left_on="x", right_on="y")


def test_theta_fastpath_probe_demotes_on_typeerror(spark):
    # a condition that TypeErrors on Columns (math.gcd needs ints)
    # still lands on the pandas_udf path and evaluates correctly
    left = spark.createDataFrame([(4,), (5,)], "x long")
    right = spark.createDataFrame([(8,), (7,)], "y long")
    out = theta_join(
        left,
        right,
        condition=lambda x, y: math.gcd(int(x), int(y)) > 1,
        left_on="x",
        right_on="y",
    )
    assert rows_set(out, ["x", "y"]) == {(4, 8)}


def test_theta_condition_probe_called_once_at_plan_time(spark):
    # the Column-polymorphism probe executes the condition ONCE while
    # building the plan (documented caveat); execution of the job must
    # not call a Column-polymorphic condition again per row
    left = spark.createDataFrame([(i,) for i in range(5)], "a long")
    right = spark.createDataFrame([(i,) for i in range(5)], "b long")
    calls = []

    def cond(x, y):
        calls.append(1)
        return x == y

    out = theta_join(left, right, cond, left_on="a", right_on="b")
    assert len(calls) == 1  # probed exactly once at plan time
    assert out.count() == 5
    assert len(calls) == 1  # collect did not re-enter the callable


def test_theta_stateful_condition_probe_failure_still_correct(spark):
    # a condition whose side effects fire before a probe-swallowed
    # TypeError must still produce the right answer via the pandas
    # path, with the partial side effect confined to plan time
    left = spark.createDataFrame([(2,), (3,), (4,)], "a long")
    right = spark.createDataFrame([(2,), (4,), (9,)], "b long")
    state = []

    def cond(x, y):
        state.append(("called", type(x).__name__))
        return math.gcd(int(x), int(y)) > 1  # TypeError on Column args

    out = theta_join(left, right, cond, left_on="a", right_on="b")
    got = {(r["a"], r["b"]) for r in out.collect()}
    exp = {
        (a, b)
        for a in (2, 3, 4)
        for b in (2, 4, 9)
        if math.gcd(a, b) > 1
    }
    assert got == exp
    # the plan-time probe left exactly one Column-typed state entry
    assert state[0] == ("called", "Column")
