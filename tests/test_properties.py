"""Property-based tests (Hypothesis), porting the reference's technique
(reference test/test_ops.py:88-164, :386-408 — seeded @given properties).

Each example spins Spark jobs, so example counts are kept small; the
properties themselves are the reference's: every output row satisfies
the join predicate, result sets equal the brute-force oracle, and the
closed-form ineq overlap count A*B + C(L,2) - L^2 holds.
"""

import datetime as _dt
import math

import pytest
from hypothesis import HealthCheck, assume, given, settings, strategies as st
from pyspark.sql import functions as F

from pandance_spark import fuzzy_join, ineq_join

import os as _os

_SETTINGS = dict(
    # 8 examples by default (each spins Spark jobs); raise via
    # PDX_PROP_EXAMPLES=40 for an occasional deep fuzz pass
    max_examples=int(_os.environ.get("PDX_PROP_EXAMPLES", "8")),
    deadline=None,
    derandomize=True,  # seeded, reproducible (reference seeds 42)
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    lvals=st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=12,
    ),
    rvals=st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=12,
    ),
    tol=st.floats(0.001, 10.0, allow_nan=False),
)
def test_fuzzy_matches_brute_force(spark, lvals, rvals, tol):
    left = spark.createDataFrame([(i, float(v)) for i, v in enumerate(lvals)], "i long, v double")
    right = spark.createDataFrame([(j, float(v)) for j, v in enumerate(rvals)], "j long, v double")
    out = fuzzy_join(left, right, on="v", tol=tol, strategy="band")
    got = {(r["i"], r["j"]) for r in out.collect()}
    expected = {
        (i, j)
        for i, a in enumerate(lvals)
        for j, b in enumerate(rvals)
        if abs(a - b) <= tol
    }
    assert got == expected
    # every output row satisfies the predicate exactly (reference
    # re-verifies per-row with Decimal, test_ops.py:157-164)
    for r in out.collect():
        assert abs(r["v_x"] - r["v_y"]) <= tol


@settings(**_SETTINGS)
@given(
    a=st.integers(1, 12),
    b=st.integers(1, 12),
    data=st.data(),
    how=st.sampled_from(["<", "<=", ">", ">="]),
)
def test_ineq_matches_brute_force(spark, a, b, data, how):
    overlap = data.draw(st.integers(0, min(a, b)))
    lvals = list(range(a))
    rvals = list(range(a - overlap, a - overlap + b))
    left = spark.createDataFrame([(v,) for v in lvals], "val long")
    right = spark.createDataFrame([(v,) for v in rvals], "val long")
    ops = {"<": float.__lt__, "<=": float.__le__, ">": float.__gt__, ">=": float.__ge__}
    for strategy in ("bnl", "band"):
        out = ineq_join(left, right, how=how, on="val", strategy=strategy)
        got = sorted((r["val_x"], r["val_y"]) for r in out.collect())
        expected = sorted(
            (x, y) for x in lvals for y in rvals if ops[how](float(x), float(y))
        )
        assert got == expected
    if how == "<":
        # closed form from the reference docs
        # (test_ops.py:407-408, getting_started.rst:322-325)
        assert len(got) == a * b + math.comb(overlap, 2) - overlap * overlap


@settings(**_SETTINGS)
@given(
    lints=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 30)),
        min_size=1,
        max_size=10,
    ),
    rints=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 30)),
        min_size=1,
        max_size=10,
    ),
)
def test_overlap_band_matches_brute_force(spark, lints, rints):
    from pandance_spark.operators.overlap import overlap_join

    lrows = [(i, s, s + w) for i, (s, w) in enumerate(lints)]
    rrows = [(i, s, s + w) for i, (s, w) in enumerate(rints)]
    left = spark.createDataFrame(lrows, "id long, s long, e long")
    right = spark.createDataFrame(rrows, "id long, s long, e long")
    out = overlap_join(left, right, "s", "e", "s", "e", strategy="band", num_bands=4)
    got = {(r["id_x"], r["id_y"]) for r in out.collect()}
    # exactly-once check: no duplicate pairs
    assert out.count() == len(got)
    expected = {
        (i, j)
        for i, ls, le in lrows
        for j, rs, re in rrows
        if ls <= re and rs <= le
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    lts=st.lists(st.integers(0, 1000), min_size=1, max_size=12),
    rts=st.lists(st.integers(0, 1000), min_size=1, max_size=12),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_matches_brute_force(spark, lts, rts, direction):
    from pandance_spark.operators.asof import asof_join

    left = spark.createDataFrame([(i, t) for i, t in enumerate(lts)], "i long, t long")
    right = spark.createDataFrame(
        [(j, t) for j, t in enumerate(sorted(set(rts)))], "j long, t long"
    )
    rrows = sorted(set(rts))
    out = asof_join(left, right, on="t", direction=direction, how="left", num_buckets=3)
    got = {r["i"]: r["t_y"] for r in out.collect()}
    for i, t in enumerate(lts):
        if direction == "backward":
            cands = [rt for rt in rrows if rt <= t]
            expected = max(cands) if cands else None
        else:
            cands = [rt for rt in rrows if rt >= t]
            expected = min(cands) if cands else None
        assert got[i] == expected, (i, t, direction)


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab cd",  # tiny alphabet -> heavy shared k-grams
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 6),
    mod=st.sampled_from([1, 2, 4]),
)
def test_fingerprints_match_brute_force(spark, texts, k, mod):
    """Every selected fingerprint corresponds to a real k-gram whose
    portable hash ≡ 0 (mod p) — recomputed row by row in Python."""
    import hashlib

    from pandance_spark.functions.text import char_ngram_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["fps"]
        for r in df.select(
            "doc_id", char_ngram_fingerprints(F.col("text"), k, mod).alias("fps")
        ).collect()
    }
    for i, t in enumerate(texts):
        lo = t.lower()
        hashes = set()
        for s in range(len(lo) - k + 1):
            g = lo[s : s + k]
            h = int(hashlib.md5(g.encode()).hexdigest()[:14], 16)
            if h % mod == 0:
                hashes.add(h)
        assert got[i] == sorted(hashes), (i, t)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["apple", "banana", "cherry", "durian", "fig"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    ),
    terms=st.lists(
        st.sampled_from(["apple", "banana", "cherry"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_bm25_matches_brute_force(spark, docs, terms):
    import math as _math

    from pandance_spark.functions.ranking import bm25_topk

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, "doc_id", "text", terms, k=100).collect()
    }
    N = len(docs)
    avgdl = sum(len(d) for d in docs) / N
    dfreq = {t: sum(1 for d in docs if t in d) for t in terms}
    for i, d in enumerate(docs):
        s = 0.0
        for t in set(terms):
            tf = d.count(t)
            if tf == 0:
                continue
            idf = _math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl))
        if s > 0:
            assert got[i] == pytest.approx(round(s, 6), abs=2e-6), i
        else:
            assert i not in got


@settings(**_SETTINGS)
@given(a=st.integers(0, 10), b=st.integers(0, 10), data=st.data())
def test_ineq_overlap_closed_form(spark, a, b, data):
    """Dedicated port of the reference's closed-form overlap property
    (test_ops.py:386-408): two integer ranges with overlap L joined by
    '<' produce EXACTLY A*B + C(L,2) - L^2 rows, for every (A, B, L)
    and BOTH strategies.  Unlike the brute-force property this pins
    band boundary off-by-ones by construction: the overlap region
    straddles quantile cuts, and any inclusive/exclusive slip at a
    band edge shifts the count."""
    overlap = data.draw(st.integers(0, min(a, b)))
    left = spark.createDataFrame([(v,) for v in range(a)], "val long")
    right = spark.createDataFrame(
        [(v,) for v in range(a - overlap, a - overlap + b)], "val long"
    )
    expected = a * b + math.comb(overlap, 2) - overlap * overlap
    for strategy in ("band", "bnl"):
        got = ineq_join(left, right, how="<", on="val", strategy=strategy).count()
        assert got == expected, (strategy, a, b, overlap)


@settings(**_SETTINGS)
@given(
    start=st.datetimes(
        min_value=_dt.datetime(2022, 1, 1, 0, 0),
        max_value=_dt.datetime(2022, 1, 2, 0, 0),
    ),
    end=st.datetimes(
        min_value=_dt.datetime(2022, 1, 1, 0, 0),
        max_value=_dt.datetime(2022, 1, 2, 0, 0),
    ),
)
def test_fuzzy_random_datetime_ranges(spark, start, end):
    """Port of the reference's random-datetime fuzzy property
    (test_ops.py:88-121): hourly timestamps over a random [start, end]
    range fuzzy-joined against the range end with a 1-hour timedelta
    tolerance — band strategy == exact range strategy == brute force.
    Random sub-second datetimes exercise microsecond band boundaries."""
    assume(start <= end)
    step = _dt.timedelta(hours=1)
    times_a, t = [], start
    while t <= end:
        times_a.append(t)
        t += step
    tol = _dt.timedelta(hours=1)
    left = spark.createDataFrame(
        [(i, v) for i, v in enumerate(times_a)], "i long, t timestamp"
    )
    right = spark.createDataFrame([(0, end)], "j long, t timestamp")
    expected = {
        (i, 0) for i, v in enumerate(times_a) if abs(v - end) <= tol
    }
    for strategy in ("band", "range"):
        out = fuzzy_join(left, right, on="t", tol=tol, strategy=strategy)
        got = {(r["i"], r["j"]) for r in out.collect()}
        assert got == expected, (strategy, start, end)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                 # key
            st.sampled_from(["a", "b", "c"]),  # tracked attr
            st.integers(0, 50),                # ts offset (seconds)
        ),
        min_size=1,
        max_size=25,
    ),
    split=st.integers(0, 24),
)
def test_scd2_matches_brute_force_and_apply_is_splice(spark, rows, split):
    """scd2_history == a per-key Python fold (sort, drop consecutive
    unchanged, close intervals with the successor's start), and
    scd2_apply over any batch split equals history of the whole log."""
    from pandance_spark.operators.scd import scd2_apply, scd2_history

    base = _dt.datetime(2024, 1, 1)
    # unique (key, ts) pairs: equal-ts observations of one key need a
    # tie-break column, which the apply path deliberately omits
    seen, uniq = set(), []
    for k, a, s in rows:
        if (k, s) not in seen:
            seen.add((k, s))
            uniq.append((k, a, base + _dt.timedelta(seconds=s)))
    df = spark.createDataFrame(uniq, "k long, a string, ts timestamp")

    def brute(log):
        out = set()
        bykey = {}
        for k, a, t in sorted(log, key=lambda r: (r[0], r[2])):
            bykey.setdefault(k, []).append((a, t))
        for k, obs in bykey.items():
            versions = []
            for a, t in obs:
                if not versions or versions[-1][0] != a:
                    versions.append((a, t))
            for i, (a, t) in enumerate(versions):
                nxt = versions[i + 1][1] if i + 1 < len(versions) else None
                out.add((k, a, t, nxt, nxt is None))
        return out

    got = {
        (r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, ["k"], ["a"], "ts").collect()
    }
    assert got == brute(uniq)

    split_n = min(split, len(uniq))
    dim = scd2_history(
        spark.createDataFrame(uniq[:split_n] or [(99, "x", base)],
                              "k long, a string, ts timestamp"),
        ["k"], ["a"], "ts",
    )
    batch = spark.createDataFrame(uniq[split_n:] or [(99, "x", base)],
                                  "k long, a string, ts timestamp")
    merged = {
        (r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_apply(dim, batch, ["k"], ["a"], "ts").collect()
    }
    padded = uniq[:split_n] + uniq[split_n:]
    want = brute(padded + ([(99, "x", base)] if (split_n == 0 or split_n == len(uniq)) else []))
    assert merged == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(**_SETTINGS)
@given(
    strs=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=6),
        min_size=2,
        max_size=8,
    ),
    d=st.integers(0, 2),
)
def test_edit_distance_join_matches_brute_force(spark, strs, d):
    """Every pair within levenshtein distance d is found with its exact
    distance, and nothing else — exercises both the positional-prefix
    path and the short-string length-banded fallback (tiny 'ab'
    alphabet = worst case for gram-type selectivity)."""
    from pandance_spark.operators.dedup import edit_distance_join

    rows = list(enumerate(strs))
    df = spark.createDataFrame(rows, "id int, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s", max_dist=d, q=2).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= d
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=0,
            max_size=8,
        ),
        min_size=2,
        max_size=8,
    ),
    c=st.integers(1, 3),
)
def test_overlap_set_join_matches_brute_force(spark, docs, c):
    """Exact absolute-count overlap join: pairs of docs whose DISTINCT
    token sets share >= c elements, with the exact overlap size."""
    from pandance_spark.operators.dedup import overlap_set_join

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r["id_a"], r["id_b"], r["overlap"])
        for r in overlap_set_join(
            df, "id", "text", min_overlap=c, shingle_n=1
        ).collect()
    }
    sets = {i: set(ws) for i, ws in enumerate(docs)}
    want = {
        (i, j, len(sets[i] & sets[j]))
        for i in sets
        for j in sets
        if i < j and len(sets[i] & sets[j]) >= c
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 10)),
        min_size=1,
        max_size=12,
    )
)
def test_merge_intervals_matches_brute_force(spark, ivs):
    """Island count, bounds and member counts equal a brute-force
    sweep over sorted intervals (touching endpoints merge)."""
    from pandance_spark.operators.overlap import merge_intervals

    rows = [(s, s + w) for s, w in ivs]
    df = spark.createDataFrame(rows, "s int, e int")
    got = sorted(
        (r["s"], r["e"], r["n_merged"])
        for r in merge_intervals(df, "s", "e").collect()
    )
    want = []
    for s, e in sorted(rows):
        if want and s <= want[-1][1]:
            ps, pe, n = want[-1]
            want[-1] = (ps, max(pe, e), n + 1)
        else:
            want.append((s, e, 1))
    assert got == sorted(want)


@settings(**_SETTINGS)
@given(
    # offsets land max|v| within one tol of the 2^51 quotient guard —
    # the exact cliff the band strategy's +-2 bucket margin covers
    base_off=st.integers(-6, -2),
    span=st.integers(1, 3),
)
def test_fuzzy_band_equals_range_up_to_operating_guard(spark, base_off, span):
    # r4 verdict item 6: the documented silent-wrong-answer edge of the
    # core operators.  Just BELOW the guard (|v|/tol <= 2^51) band and
    # range must agree exactly; just ABOVE it, strategy='band' must
    # raise and 'auto' must fall back to range (same result, no raise).
    tol = 1.0
    cliff = 1 << 51
    below = [(float(cliff + base_off - i),) for i in range(span + 1)]
    left = spark.createDataFrame(below, "v double")
    right = spark.createDataFrame(below[: span], "v double")
    band = fuzzy_join(left, right, on="v", tol=tol, strategy="band")
    rng = fuzzy_join(left, right, on="v", tol=tol, strategy="range")
    key = ["v_x", "v_y"]
    assert sorted(map(tuple, band.select(*key).collect())) == sorted(
        map(tuple, rng.select(*key).collect())
    )
    assert band.count() > 0  # adjacent values within tol really match

    # spaced > tol so neither min/max fast path (empty or full cross
    # product) short-circuits before the operating-range guard
    above = [(float(cliff) * 1.5,), (float(cliff) * 1.5 + 10.0,)]
    l2 = spark.createDataFrame(above, "v double")
    r2 = spark.createDataFrame(above, "v double")
    with pytest.raises(ValueError, match="operating range"):
        fuzzy_join(l2, r2, on="v", tol=tol, strategy="band")
    # auto silently takes the exact path instead
    auto = fuzzy_join(l2, r2, on="v", tol=tol, strategy="auto")
    exact = fuzzy_join(l2, r2, on="v", tol=tol, strategy="range")
    assert sorted(map(tuple, auto.select(*key).collect())) == sorted(
        map(tuple, exact.select(*key).collect())
    )


@settings(**_SETTINGS)
@given(
    hot_share=st.integers(min_value=2, max_value=9),  # x10 hot RIGHT rows
    n_right=st.integers(min_value=30, max_value=120),
    how=st.sampled_from(["<", "<=", ">", ">="]),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_ineq_salted_equals_unsalted_on_random_skew(
    spark, hot_share, n_right, how, seed
):
    # r6 auto-skew: for ANY hot-key concentration, the salted band
    # join must return exactly the unsalted result set — salting may
    # only change the physical plan, never the pairs
    import random

    rnd = random.Random(seed)
    hot_val = float(rnd.randrange(0, 500))
    n_hot = 10 * hot_share
    right_vals = [hot_val] * n_hot + [
        float(rnd.randrange(0, 1000)) for _ in range(n_right)
    ]
    left_vals = [float(rnd.randrange(0, 1000)) for _ in range(25)]
    right = spark.createDataFrame(
        [(v, i) for i, v in enumerate(right_vals)], "v double, rid long"
    )
    left = spark.createDataFrame(
        [(v, i) for i, v in enumerate(left_vals)], "v double, lid long"
    )
    kw = dict(on="v", how=how, strategy="band", num_bands=16,
              disjoint_fast_path=False)
    salted = ineq_join(left, right, skew_salting="always", **kw)
    plain = ineq_join(left, right, skew_salting="never", **kw)
    key = ["lid", "rid"]
    got_s = sorted(map(tuple, salted.select(*key).collect()))
    got_p = sorted(map(tuple, plain.select(*key).collect()))
    assert got_s == got_p


@settings(**_SETTINGS)
@given(
    n_hot_l=st.integers(min_value=0, max_value=60),
    n_hot_r=st.integers(min_value=0, max_value=60),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_fuzzy_salted_equals_unsalted_on_random_skew(
    spark, n_hot_l, n_hot_r, seed
):
    # r6 two-sided salt cells: atoms on the left, the right, both, or
    # neither — the salted result must equal the exact range join
    import random

    rnd = random.Random(seed)
    atom_l = rnd.randrange(0, 300) + 0.5
    atom_r = rnd.randrange(0, 300) + 0.25
    lv = [atom_l] * n_hot_l + [
        rnd.randrange(0, 3000) / 10.0 for _ in range(40)
    ]
    rv = [atom_r] * n_hot_r + [
        rnd.randrange(0, 3000) / 10.0 for _ in range(40)
    ]
    left = spark.createDataFrame(
        [(v, i) for i, v in enumerate(lv)], "v double, lid long"
    )
    right = spark.createDataFrame(
        [(v, i) for i, v in enumerate(rv)], "v double, rid long"
    )
    kw = dict(on="v", tol=0.5, disjoint_fast_path=False)
    salted = fuzzy_join(left, right, strategy="band",
                        skew_salting="always", **kw)
    rng = fuzzy_join(left, right, strategy="range", **kw)
    key = ["lid", "rid"]
    assert sorted(map(tuple, salted.select(*key).collect())) == sorted(
        map(tuple, rng.select(*key).collect())
    )


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(2, 4),
)
def test_dedup_substrings_matches_bruteforce(spark, docs, k):
    """Every maximal >=k-token shared span, and nothing else — checked
    against an O(n^2 m^2) brute force on tiny random corpora over a
    6-word vocab (heavy collisions by construction)."""
    from pandance_spark.operators.dedup import dedup_substrings

    rows = [(i, " ".join(f"t{w}" for w in ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        tuple(r)
        for r in dedup_substrings(df, "id", "text", min_tokens=k).collect()
    }

    toks = {i: t.split() for i, t in rows}
    exp = set()
    ids = sorted(toks)
    for ai in ids:
        for bi in ids:
            if bi < ai:
                continue
            a, b = toks[ai], toks[bi]
            for i in range(len(a)):
                for j in range(len(b)):
                    if ai == bi and j <= i:
                        continue
                    if a[i] != b[j]:
                        continue
                    same = ai == bi
                    if (
                        i > 0
                        and j > 0
                        and a[i - 1] == b[j - 1]
                        and not (same and j - 1 == i - 1)
                    ):
                        continue  # extendable left -> not maximal start
                    ln = 0
                    while (
                        i + ln < len(a)
                        and j + ln < len(b)
                        and a[i + ln] == b[j + ln]
                        and not (same and j + ln == i + ln)
                    ):
                        ln += 1
                    if ln >= k:
                        exp.add((ai, bi, i, j, ln))
    assert got == exp


@settings(**_SETTINGS)
@given(data=st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip_property(data):
    """GIF LZW encode/decode round-trips arbitrary bytes (code-width
    growth and table behavior exercised by low-entropy inputs the
    shrinker gravitates to)."""
    from pandance_spark.operators.multimodal import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data) + 16) == data


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
    ),
    bits=st.integers(1, 12),
)
def test_zorder_key_property(spark, vals, bits):
    """Spark zorder_key == the plain-Python Morton reference for random
    integer pairs, ranges and bit widths (the cross-engine-exactness
    claim, fuzzed)."""
    from pandance_spark.functions.layout import zorder_key

    xs = [v[0] for v in vals]
    ys = [v[1] for v in vals]
    mins = [min(xs), min(ys)]
    maxs = [max(xs), max(ys)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(vals)],
        "i long, x long, y long",
    )
    got = {
        r["i"]: r["k"]
        for r in df.select(
            "i",
            zorder_key(
                [F.col("x"), F.col("y")], mins, maxs, bits
            ).alias("k"),
        ).collect()
    }
    top = (1 << bits) - 1
    for i, (x, y) in enumerate(vals):
        key = 0
        for j, (v, lo, hi) in enumerate(
            ((x, mins[0], maxs[0]), (y, mins[1], maxs[1]))
        ):
            span = hi - lo
            rank = ((v - lo) * top) // span if span else 0
            for b in range(bits):
                key |= ((rank >> b) & 1) << (b * 2 + j)
        assert got[i] == key, (i, x, y, bits)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=1, max_size=19),
        min_size=1,
        max_size=30,
    )
)
def test_luhn_valid_matches_python_reference(spark, digit_strings):
    """Spark's interpreted Luhn fold == the textbook Python Luhn, on
    arbitrary digit strings (one DataFrame per example, all strings
    batched)."""
    from pandance_spark.functions.text import luhn_valid

    def py_luhn(s: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(digit_strings)], "i int, s string"
    )
    got = {
        r["i"]: r["ok"]
        for r in df.select("i", luhn_valid(F.col("s")).alias("ok")).collect()
    }
    want = {i: py_luhn(s) for i, s in enumerate(digit_strings)}
    assert got == want


@settings(**_SETTINGS)
@given(
    qtexts=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=10).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1, max_size=5,
    ),
    ctexts=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=14).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1, max_size=5,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]),
)
def test_containment_matches_brute_force(spark, qtexts, ctexts, threshold):
    """containment_join over a tiny alphabet (maximal shingle
    collisions between docs — the hardest case for prefix pruning)
    equals the brute-force |A∩B|/|A| on string shingle sets."""
    from pandance_spark.operators.dedup import containment_join

    query = spark.createDataFrame(
        list(enumerate(qtexts)), "qid long, text string"
    )
    corpus = spark.createDataFrame(
        [(100 + j, t) for j, t in enumerate(ctexts)], "cid long, text string"
    )
    got = {
        (r["query_id"], r["corpus_id"]): r["containment"]
        for r in containment_join(
            query, corpus, "qid", "text", "cid", "text",
            shingle_n=2, threshold=threshold,
        ).collect()
    }

    def sh(t):
        toks = [w for w in t.lower().split() if w]
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    expected = {}
    for qid, qt in enumerate(qtexts):
        qs = sh(qt)
        if not qs:
            continue
        for j, ct in enumerate(ctexts):
            c = round(len(qs & sh(ct)) / len(qs), 6)
            if c >= threshold:
                expected[(qid, 100 + j)] = c
    assert got == expected


@settings(**_SETTINGS)
@given(
    uids=st.lists(st.integers(0, 500), min_size=1, max_size=60),
    split=st.integers(1, 6),
    k=st.sampled_from([2, 4, 8]),
)
def test_bottomk_merge_property(spark, uids, split, k):
    """For ANY partition of the input into batches, merging the
    per-batch bottom-k sketches equals the from-scratch build —
    including duplicate ids across batches."""
    import datetime as dt

    from pandance_spark.operators.rollup import (
        build_rollup_bottomk,
        merge_rollup_bottomk,
    )

    ts = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(u, ts) for u in uids]
    schema = "uid long, ts timestamp"
    full = spark.createDataFrame(rows, schema)

    def sketch(df):
        return sorted(
            (r["bucket"], [(e["h"], e["v"]) for e in r["bk"]])
            for r in build_rollup_bottomk(
                df, "ts", 3600, [], "uid", k=k
            ).collect()
        )

    scratch = sketch(full)
    parts = [
        spark.createDataFrame(
            [(u, ts) for i, u in enumerate(uids) if i % split == m] or
            [(None, None)], schema,
        ).filter("uid IS NOT NULL")
        for m in range(split)
    ]
    merged = build_rollup_bottomk(parts[0], "ts", 3600, [], "uid", k=k)
    for p in parts[1:]:
        merged = merge_rollup_bottomk(
            merged, build_rollup_bottomk(p, "ts", 3600, [], "uid", k=k), k=k
        )
    got = sorted(
        (r["bucket"], [(e["h"], e["v"]) for e in r["bk"]])
        for r in merged.collect()
    )
    assert got == scratch


@settings(**_SETTINGS)
@given(
    uids=st.lists(st.integers(0, 500), min_size=3, max_size=60),
    k=st.sampled_from([2, 4, 8]),
)
def test_bottomk_merge_associativity(spark, uids, k):
    """merge is ASSOCIATIVE, not just partition-invariant: for a
    3-way split, merge(merge(a,b),c) == merge(a,merge(b,c))
    bit-for-bit — the property that lets a tree/shuffle reducer
    combine partials in whatever order the scheduler delivers them."""
    import datetime as dt

    from pandance_spark.operators.rollup import (
        build_rollup_bottomk,
        merge_rollup_bottomk,
    )

    ts = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "uid long, ts timestamp"
    sketches = [
        build_rollup_bottomk(
            spark.createDataFrame(
                [(u, ts) for i, u in enumerate(uids) if i % 3 == m]
                or [(uids[0], ts)],
                schema,
            ),
            "ts", 3600, [], "uid", k=k,
        )
        for m in range(3)
    ]
    a, b, c = sketches

    def canon(df):
        return sorted(
            (r["bucket"], [(e["h"], e["v"]) for e in r["bk"]])
            for r in df.collect()
        )

    left = merge_rollup_bottomk(merge_rollup_bottomk(a, b, k=k), c, k=k)
    right = merge_rollup_bottomk(a, merge_rollup_bottomk(b, c, k=k), k=k)
    assert canon(left) == canon(right)


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.sampled_from(
            ["café", "naïve", "—", "“quote”"[:1], "plain", "ascii", "ü", "€"]
        ),
        min_size=1,
        max_size=8,
    )
)
def test_mojibake_roundtrip_property(spark, words):
    """fix(corrupt(s)) == s for any text whose non-ASCII chars are
    table targets: corrupting via encode('utf-8').decode('cp1252')
    and repairing via fix_mojibake is the identity."""
    from pyspark.sql import functions as F

    from pandance_spark.functions.text import fix_mojibake

    s = " ".join(words)
    corrupted = s.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame([(corrupted,)], "t string")
    got = df.select(fix_mojibake(F.col("t")).alias("f")).collect()[0]["f"]
    assert got == s


@settings(**_SETTINGS)
@given(
    lines=st.lists(
        st.one_of(
            st.text(alphabet=list('abc XYZ.!?"{}#'), max_size=12),
            st.sampled_from(
                [
                    "please use javascript here.",
                    "lorem ipsum dolor sit amet.",
                    "a b c d e f.",
                    "   ",
                ]
            ),
        ),
        max_size=8,
    ),
    min_words=st.integers(1, 6),
    min_sentences=st.integers(1, 4),
)
def test_c4_clean_matches_python_reference(
    spark, lines, min_words, min_sentences
):
    """c4_clean vs a line-by-line Python reimplementation of the
    documented rules, on arbitrary text including rule-triggering
    fragments, blank lines and punctuation-only lines."""
    import re

    from pandance_spark.functions.text import c4_clean

    page = "\n".join(lines)
    row = c4_clean(
        spark.createDataFrame([(1, page)], ["k", "page"]),
        "page",
        badwords=("abc",),
        min_words=min_words,
        min_sentences=min_sentences,
    ).collect()[0]

    kept = []
    for ln in page.split("\n"):
        t = ln.strip()
        words = [w for w in re.split(r"\s+", t) if w != ""]
        if (
            re.search(r'[.!?"]$', t)
            and len(words) >= min_words
            and "javascript" not in t.lower()
        ):
            kept.append(t)
    text_c4 = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", text_c4))
    low = page.lower()
    if "lorem ipsum" in low:
        reason = "lorem_ipsum"
    elif "{" in page:
        reason = "curly_brace"
    elif re.search(r"\babc\b", low):
        reason = "bad_words"
    elif n_sent < min_sentences:
        reason = "too_few_sentences"
    else:
        reason = None
    assert row["text_c4"] == text_c4
    assert row["n_lines_kept"] == len(kept)
    assert row["n_lines_dropped"] == len(page.split("\n")) - len(kept)
    assert row["n_sentences"] == n_sent
    assert row["c4_drop_reason"] == reason
    assert row["c4_keep"] == (reason is None)


@settings(**_SETTINGS)
@given(
    hrefs=st.lists(
        st.one_of(
            st.from_regex(r"https?://[a-z]{1,6}\.example/[a-z]{0,6}", fullmatch=True),
            st.from_regex(r"//[a-z]{1,6}\.example/[a-z]{0,6}", fullmatch=True),
            st.from_regex(r"/[a-z]{0,8}", fullmatch=True),
            st.from_regex(r"[a-z]{1,8}\.html", fullmatch=True),
            st.sampled_from(
                ["#frag", "javascript:void(0)", "mailto:a@b.c", "", "  "]
            ),
        ),
        max_size=6,
    ),
)
def test_extract_links_resolution_properties(spark, hrefs):
    """Every emitted link is absolute with the base scheme preserved
    for relative forms; filtered schemes never appear; link_idx is
    dense 0..n-1 in page order."""
    from pandance_spark.functions.url import extract_links

    html = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    base = "http://www.host.example/dir/page.html"
    df = spark.createDataFrame([(1, html, base)], ["k", "html", "page_url"])
    rows = extract_links(df, "html", "page_url", keep_cols=("k",)).collect()
    crawlable = [
        h.strip()
        for h in hrefs
        if h.strip()
        and not h.strip().lower().startswith(
            ("#", "javascript:", "mailto:", "tel:", "data:")
        )
    ]
    assert len(rows) == len(crawlable)
    assert [r["link_idx"] for r in rows] == list(range(len(rows)))
    for r, h in zip(rows, crawlable):
        u = r["link_url"]
        if h.startswith(("http://", "https://")):
            assert u == h
        elif h.startswith("//"):
            assert u == "http:" + h
        elif h.startswith("/"):
            assert u == "http://www.host.example" + h
        else:
            assert u == "http://www.host.example/dir/" + h
        assert u.startswith(("http://", "https://"))


@settings(**_SETTINGS)
@given(
    spec=st.lists(  # groups: (agent names, rules: (allow?, path))
        st.tuples(
            st.lists(
                st.sampled_from(["*", "botA", "botB"]),
                min_size=1,
                max_size=2,
                unique=True,
            ),
            st.lists(
                st.tuples(
                    st.booleans(),
                    st.sampled_from(
                        ["/", "/a", "/a/b", "/ab", "/b", "/a/b/c", ""]
                    ),
                ),
                max_size=3,
            ),
        ),
        max_size=3,
    ),
    paths=st.lists(
        st.sampled_from(
            ["/", "/a", "/a/b", "/a/b/c", "/ab", "/abx", "/b/z", "/c", ""]
        ),
        min_size=1,
        max_size=6,
    ),
    agent=st.sampled_from(["*", "botA", "botC"]),
)
def test_robots_pipeline_matches_python_reference(spark, spec, paths, agent):
    """parse_robots + robots_filter vs a direct Python implementation
    of the documented semantics (group sharing, empty-rule drop,
    exclusive agent precedence, longest-match with allow-on-tie)."""
    from pandance_spark.functions.url import parse_robots, robots_filter

    lines = []
    for agents, rules in spec:
        for a in agents:
            lines.append(f"User-agent: {a}")
        for allow, path in rules:
            lines.append(("Allow: " if allow else "Disallow: ") + path)
        lines.append("")
    robots = "\n".join(lines)
    hosts = spark.createDataFrame([("h.example", robots)], ["host", "robots"])
    rules_df = parse_robots(hosts, "robots", "host")

    # python reference: expand groups -> (agent, allow, path)
    ref_rules = []
    for agents, rules in spec:
        for a in agents:
            for allow, path in rules:
                if path != "":
                    ref_rules.append((a.lower(), allow, path))
    urls = [
        (i, "http://h.example" + p) for i, p in enumerate(paths)
    ]
    df = spark.createDataFrame(urls, ["doc_id", "u"])
    got = {
        r["doc_id"]: (r["allowed"], r["rule_path"])
        for r in robots_filter(df, "u", rules_df, agent=agent).collect()
    }
    if agent != "*" and any(a == agent for a, _, _ in ref_rules):
        appl = [(al, p) for a, al, p in ref_rules if a == agent]
    else:
        appl = [(al, p) for a, al, p in ref_rules if a == "*"]
    for i, p in enumerate(paths):
        up = p if p else "/"
        matches = [(len(pa), al, pa) for al, pa in appl if up.startswith(pa)]
        if matches:
            l, al, pa = max(matches)
            want = (bool(al), pa)
        else:
            want = (True, None)
        assert got[i] == want, (robots, agent, p, got[i], want)


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(0, 40), min_size=1, max_size=60),
    split=st.integers(1, 5),
)
def test_cms_merge_and_one_sided_property(spark, vals, split):
    """Count-Min invariants under arbitrary data and splits: (1) any
    split-and-merge equals the whole-data build cell-for-cell; (2)
    every point estimate >= its true count; (3) per hash row, the
    counters sum to the input size (mass conservation)."""
    from collections import Counter

    from pandance_spark.operators.rollup import (
        build_cms,
        cms_lookup,
        merge_cms,
    )

    D, W = 3, 16
    df = spark.createDataFrame(
        [(i, f"v{v}") for i, v in enumerate(vals)], "i long, v string"
    )
    full = sorted(map(tuple, build_cms(df, "v", D, W).collect()))
    merged = build_cms(df.filter(F.col("i") % split == 0), "v", D, W)
    for k in range(1, split):
        merged = merge_cms(
            merged, build_cms(df.filter(F.col("i") % split == k), "v", D, W)
        )
    assert sorted(map(tuple, merged.collect())) == full
    mass = Counter()
    for r, c, n in full:
        mass[r] += n
    assert all(v == len(vals) for v in mass.values())
    truth = Counter(f"v{v}" for v in vals)
    items = spark.createDataFrame(
        [(k,) for k in truth], "v string"
    )
    est = {r["v"]: r["est_n"]
           for r in cms_lookup(build_cms(df, "v", D, W), items, "v", D, W).collect()}
    assert all(est[k] >= n for k, n in truth.items())


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 50),
            st.sampled_from(["a", "b", "c", "dd", None]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
)
def test_interleave_shards_matches_window_form(spark, rows):
    """Closed-form sharded interleave == the two-window definition on
    arbitrary (key, source) sets — sizes skewed, sources missing,
    singleton sources, and NULL sources (the null-aware 'earlier
    source' branch; ADVICE r9) all covered by generation."""
    from pandance_spark.functions.split import (
        interleave_shards,
        interleave_sources,
    )

    df = spark.createDataFrame(rows, "k long, src string")
    a = {r["k"]: (r["source_rank"], r["order_idx"])
         for r in interleave_sources(df, "src", "k").collect()}
    b = {r["k"]: (r["source_rank"], r["order_idx"])
         for r in interleave_shards(df, "src", "k").collect()}
    assert a == b


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=40,
    ),
)
def test_triangle_count_matches_brute_force(spark, pairs):
    """Compact-forward oriented counting == brute-force triangle
    enumeration on arbitrary small graphs (self-loops, duplicates,
    reversed edges, disconnected vertices all generated)."""
    import itertools

    from pandance_spark.operators.cluster import triangle_count

    df = spark.createDataFrame(
        pairs or [(0, 0)], "s long, d long"
    )
    got = {r["vertex"]: r["n_triangles"]
           for r in triangle_count(df, "s", "d").collect()}
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    verts = sorted({v for e in edges for v in e})
    exp = {}
    for a, b, c in itertools.combinations(verts, 3):
        if ({(a, b), (a, c), (b, c)} <= edges):
            for v in (a, b, c):
                exp[v] = exp.get(v, 0) + 1
    assert got == exp, (got, exp)


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab1 .", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    ),
)
def test_winnowing_table_matches_column_form(spark, texts):
    """The codegen'd window-pipeline corpus form selects exactly the
    same (h, p) fingerprint sets as the reference Column fold, on
    arbitrary strings over a tiny alphabet (maximal hash ties — the
    rightmost-tie rule's worst case)."""
    from pandance_spark.functions.text import (
        winnow_fingerprint_table,
        winnow_fingerprints,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["id", "t"])
    tbl = {r["id"]: [tuple(x) for x in r["fps"]]
           for r in winnow_fingerprint_table(df, "id", "t", 4, 3).collect()}
    col = {r["id"]: [tuple(x) for x in r["fp"]]
           for r in df.select(
               "id",
               winnow_fingerprints(F.col("t"), 4, 3).alias("fp"),
           ).collect()}
    assert tbl == col


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=30,
    ),
    frac=st.sampled_from([0.0, 0.1, 0.25, 0.4]),
)
def test_trimmed_stats_matches_python_reference(spark, vals, frac):
    """trimmed/winsorized means == a pure-python replay on the same
    2^20 micro-unit snapping, for arbitrary groups and trim
    fractions."""
    from pandance_spark.functions.analytics import trimmed_stats

    df = spark.createDataFrame(vals, ["g", "v"])
    got = {r["group"]: r for r in
           trimmed_stats(df, "g", "v", trim_frac=frac).collect()}
    from collections import defaultdict

    import math

    def snap_half_up(v):
        # Spark F.round is HALF_UP (away from zero); Python round()
        # is banker's — an exact .5 micro-unit boundary would diverge
        # by 1 unit (ADVICE r10)
        x = v * (1 << 20)
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    groups = defaultdict(list)
    for g, v in vals:
        groups[g].append(snap_half_up(v))
    for g, xs in groups.items():
        xs.sort()
        n = len(xs)
        t = int(n * frac) if n > 2 * int(n * frac) else 0
        kept = xs[t:n - t]
        tm = sum(kept) / (len(kept) * (1 << 20))
        wm = (sum(kept) + t * kept[0] + t * kept[-1]) / (n * (1 << 20))
        assert got[g]["n"] == n and got[g]["n_trimmed"] == 2 * t
        assert abs(got[g]["trimmed_mean"] - round(tm, 9)) <= 1e-9
        assert abs(got[g]["winsor_mean"] - round(wm, 9)) <= 1e-9
