"""Deterministic hash-split tests (training-pipeline primitive)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandance_spark.functions.split import (
    hash_split_bucket,
    hash_split_bucket_fast,
    split_train_test,
)
from pandance_spark.sources import load_table


def test_split_deterministic_and_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train, test = split_train_test(docs, "doc_id", 0.8)
    n_train, n_test, n = train.count(), test.count(), docs.count()
    assert n_train + n_test == n
    assert 0.6 * n < n_train < 0.95 * n  # roughly 80/20 on 500 docs
    # stable across invocations (pure function of the key)
    train2, _ = split_train_test(docs, "doc_id", 0.8)
    assert {r["doc_id"] for r in train.collect()} == {
        r["doc_id"] for r in train2.collect()
    }
    # disjoint
    assert train.join(test, "doc_id", "inner").count() == 0


def test_same_key_same_side(spark):
    # rows sharing a key never straddle the split (leakage guard)
    df = spark.createDataFrame(
        [(k, i) for k in ("a", "b", "c", "d") for i in range(5)],
        "key string, i long",
    )
    train, test = split_train_test(df, "key", 0.5)
    tr_keys = {r["key"] for r in train.collect()}
    te_keys = {r["key"] for r in test.collect()}
    assert tr_keys.isdisjoint(te_keys)


def test_bucket_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", hash_split_bucket(F.col("k"), 100).alias("b")
        ).collect()
    }
    for k in range(50):
        expected = duckdb.sql(
            f"SELECT CAST('0x' || substr(md5('{k}'), 1, 8) AS BIGINT) % 100"
        ).fetchone()[0]
        assert got[k] == expected


def test_split_validation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        split_train_test(df, "k", 1.5)
    with pytest.raises(ValueError):
        hash_split_bucket(F.col("k"), 0)
    with pytest.raises(ValueError):
        hash_split_bucket_fast(F.col("k"), -1)


def test_cap_per_group(spark, sf_dir):
    from pandance_spark.functions.split import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "lang", n=30, key_col="doc_id")
    counts = {r["lang"]: r["c"] for r in
              capped.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    orig = {r["lang"]: r["c"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    for lang, c in counts.items():
        assert c == min(orig[lang], 30), lang
    # deterministic: same rows kept across invocations
    again = cap_per_group(docs, "lang", n=30, key_col="doc_id")
    assert {r["doc_id"] for r in capped.collect()} == {
        r["doc_id"] for r in again.collect()
    }
    with pytest.raises(ValueError):
        cap_per_group(docs, "lang", 0, "doc_id")


def test_stratified_sample_rates(spark):
    from pandance_spark.functions.split import hash_split_bucket, stratified_sample

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = stratified_sample(
        df, "lang", {"en": 0.5, "de": 0.2}, key_col="id", default_rate=0.0
    )
    got = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert "fr" not in got  # default_rate 0 drops the stratum entirely
    # rates hold within sampling tolerance (1000 rows per stratum)
    assert abs(got["en"] / 1000 - 0.5) < 0.08
    assert abs(got["de"] / 1000 - 0.2) < 0.08
    # determinism: same key set on rerun
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in stratified_sample(
        df, "lang", {"en": 0.5, "de": 0.2}, key_col="id", default_rate=0.0
    ).collect())
    assert ids1 == ids2
    # selection is a pure function of the key: kept ids all hash under the cut
    kept_en = {r["id"] for r in out.filter(F.col("lang") == "en").collect()}
    buckets = {
        r["id"]: r["b"]
        for r in df.select("id", hash_split_bucket(F.col("id"), 10000).alias("b")).collect()
    }
    for i in range(0, 3000, 3):
        assert (buckets[i] < 5000) == (i in kept_en)


def test_stratified_sample_validates(spark):
    import pytest as _pytest
    from pandance_spark.functions.split import stratified_sample

    df = spark.createDataFrame([(1, "en")], "id long, lang string")
    with _pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5}, key_col="id")


def test_pack_documents(spark):
    from pandance_spark.functions.split import pack_documents

    df = spark.createDataFrame(
        [(i, 100) for i in range(40)], "id long, n long"
    )
    out = pack_documents(df, "id", "n", budget=300, n_buckets=1).collect()
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r["id"])
    # 40 docs x 100 tokens, budget 300 -> packs of 3 docs (exclusive
    # cumsum: docs 0,1,2 have cumsum 0,100,200 -> pack 0; doc 3 -> 300/300=1)
    assert len(packs) == 14
    sizes = sorted(len(v) for v in packs.values())
    assert sizes == [1] + [3] * 13
    # deterministic: doc order by id within the single bucket
    assert packs[0] == [0, 1, 2]


def test_pack_documents_buckets_parallel(spark):
    from pandance_spark.functions.split import pack_documents

    df = spark.createDataFrame([(i, 50) for i in range(200)], "id long, n long")
    out = pack_documents(df, "id", "n", budget=500, n_buckets=16)
    # every doc assigned; pack totals within a (bucket, pack) pair stay
    # near budget (can straddle by at most one doc)
    agg = out.groupBy("pack_bucket", "pack_id").agg(
        F.sum("n").alias("total"), F.count("*").alias("c")
    ).collect()
    assert sum(r["c"] for r in agg) == 200
    for r in agg:
        assert r["total"] <= 500 + 50  # budget + one straddling doc


def test_chunk_documents_windows(spark):
    from pandance_spark.functions.split import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))          # 10 tokens
    df = spark.createDataFrame(
        [
            (1, words),         # max=4, ov=1 -> stride 3 -> chunks at 0,3,6,9
            (2, "one two"),     # fits one window
            (3, ""),            # no tokens -> no chunks
            (4, "###"),         # tokenizes to nothing -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", max_tokens=4, overlap=1)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): ("w0 w1 w2 w3", 4),
        (1, 1): ("w3 w4 w5 w6", 4),
        (1, 2): ("w6 w7 w8 w9", 4),
        (2, 0): ("one two", 2),
    }
    # every adjacent chunk pair shares exactly `overlap` tokens
    assert got[(1, 0)][0].split()[-1:] == got[(1, 1)][0].split()[:1]


def test_chunk_documents_boundary_counts(spark):
    from pandance_spark.functions.split import chunk_documents

    import pytest as _pytest

    def n_chunks_for(n_tokens):
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(n_tokens)))],
            "doc_id long, text string",
        )
        return chunk_documents(df, "doc_id", "text", max_tokens=8, overlap=2).count()

    assert n_chunks_for(8) == 1
    assert n_chunks_for(9) == 2      # stride 6: second chunk = tokens 6..8
    assert n_chunks_for(14) == 2
    assert n_chunks_for(15) == 3

    with _pytest.raises(ValueError):
        chunk_documents(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "doc_id", "text", max_tokens=4, overlap=4,
        )


def test_temperature_sample_quotas_and_determinism(spark):
    import hashlib
    import math

    from pandance_spark.functions.split import temperature_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = temperature_sample(df, "domain", "id", target_rows=200, alpha=0.5)
    got = sorted(r["id"] for r in out.collect())

    # brute-force replication: same md5 bucket rule, same rate formula
    n = {"big": 900, "small": 100}
    w = {d: math.sqrt(c) for d, c in n.items()}
    tw = sum(w.values())
    rate = {d: min(1.0, 200 * w[d] / (tw * n[d])) for d in n}
    want = []
    for i, d in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
        if h < rate[d] * 1_000_000:
            want.append(i)
    assert got == sorted(want)

    # alpha=0.5 up-weights the rare domain vs proportional sampling
    by_dom = {
        d: sum(1 for i in got if (("big" if i < 900 else "small") == d))
        for d in n
    }
    assert by_dom["small"] / 100 > by_dom["big"] / 900
    # stable across re-evaluation
    assert sorted(r["id"] for r in out.collect()) == got


def test_temperature_sample_validates(spark):
    from pandance_spark.functions.split import temperature_sample

    df = spark.createDataFrame([(1, "a")], "id long, domain string")
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_sample(df, "domain", "id", target_rows=0)
    with _pt.raises(ValueError):
        temperature_sample(df, "domain", "id", target_rows=5, alpha=-1.0)


def test_temperature_sample_null_domain_stratum(spark):
    from pandance_spark.functions.split import temperature_sample

    rows = [(i, "known" if i < 50 else None) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = temperature_sample(df, "domain", "id", target_rows=100, alpha=0.5)
    # rate 1.0 for both strata (target >= corpus): NULL-domain rows
    # must survive via the null-safe join, nothing silently dropped
    assert out.count() == 100
    assert out.filter("domain IS NULL").count() == 50


def test_exact_sample(spark):
    import hashlib

    from pandance_spark.functions.split import exact_sample

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    got = sorted(r["id"] for r in exact_sample(df, "id", 50).collect())
    want = sorted(
        range(200), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:50]
    assert got == sorted(want)
    assert exact_sample(df, "id", 1000).count() == 200  # capped at corpus
    # TakeOrderedAndProject, not a global sort
    plan = exact_sample(df, "id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    import pytest as _pt

    with _pt.raises(ValueError):
        exact_sample(df, "id", 0)


def test_epoch_mixture_exact_multiset(spark):
    import hashlib

    from pandance_spark.functions.split import epoch_mixture

    rows = [(i, "a" if i < 10 else ("b" if i < 20 else "c"))
            for i in range(30)]
    df = spark.createDataFrame(rows, ["k", "dom"])
    out = epoch_mixture(
        df, "dom", "k", {"a": 2.5, "b": 0.25, "c": 0.0}, default=1.0
    ).collect()

    def bucket(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 1_000_000

    exp = []
    for k, dom in rows:
        em = {"a": 2_500_000, "b": 250_000, "c": 0}[dom]
        copies = em // 1_000_000 + (1 if bucket(k) < em % 1_000_000 else 0)
        exp += [(k, dom, e) for e in range(1, copies + 1)]
    assert sorted((r["k"], r["dom"], r["epoch"]) for r in out) == sorted(exp)
    # domain c fully dropped; every a-row has >= 2 epochs
    assert all(d != "c" for _, d, _ in exp)


def test_epoch_mixture_default_and_guards(spark):
    import pytest as _pytest

    from pandance_spark.functions.split import epoch_mixture

    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "dom"])
    out = epoch_mixture(df, "dom", "k", {"x": 3.0}).collect()
    ks = sorted((r["k"], r["epoch"]) for r in out)
    assert ks == [(1, 1), (1, 2), (1, 3), (2, 1)]  # default 1.0 for y
    with _pytest.raises(ValueError):
        epoch_mixture(df, "dom", "k", {"x": -1.0})


def test_epoch_mixture_null_key_keeps_floor_copies(spark):
    # review fix: NULL key -> no hash bucket -> the fractional copy
    # never fires, but floor(e) copies MUST survive (coalesce, not a
    # silent NULL-copies drop)
    from pandance_spark.functions.split import epoch_mixture

    df = spark.createDataFrame(
        [(None, "a"), ("k1", "a")], "k string, dom string"
    )
    out = epoch_mixture(df, "dom", "k", {"a": 2.5}).collect()
    null_rows = [r for r in out if r["k"] is None]
    assert sorted(r["epoch"] for r in null_rows) == [1, 2]  # floor(2.5)


def test_shuffle_shards_deterministic_and_balanced(spark):
    from pandance_spark.functions.split import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = shuffle_shards(df, "doc_id", 8)
    b = shuffle_shards(df.repartition(13), "doc_id", 8)  # partitioning-proof
    rows_a = sorted((r["doc_id"], r["shard"], r["pos"]) for r in a.collect())
    rows_b = sorted((r["doc_id"], r["shard"], r["pos"]) for r in b.collect())
    assert rows_a == rows_b
    # per-shard positions are a compact 0..n_s-1 range
    from collections import defaultdict

    by_shard = defaultdict(list)
    for _, s, p in rows_a:
        by_shard[s].append(p)
    assert set(by_shard) == set(range(8))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # balanced-ish: no shard has more than 3x the mean
    assert max(len(p) for p in by_shard.values()) < 3 * 400 / 8
    # the order is actually shuffled, not key order
    shard0 = [d for d, s, _ in rows_a if s == 0]
    in_pos_order = [
        d for d, s, p in sorted(rows_a, key=lambda t: t[2]) if s == 0
    ]
    assert shard0 != in_pos_order or len(shard0) <= 1


def test_shuffle_shards_null_key_kept(spark):
    from pandance_spark.functions.split import shuffle_shards

    df = spark.createDataFrame([(1,), (None,)], "k int")
    out = shuffle_shards(df, "k", 4).collect()
    assert len(out) == 2 and all(r["pos"] is not None for r in out)
    import pytest as _pt

    with _pt.raises(ValueError):
        shuffle_shards(df, "k", 0)


# ----------------------------------------------------------- token budget
def _budget_docs(spark):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(id=i, grp="a" if i < 6 else "b", n_tok=10) for i in range(10)]
    )


def test_token_budget_cap_per_group_dict(spark):
    import hashlib

    from pyspark.sql import functions as F

    from pandance_spark.functions.split import token_budget_cap

    df = _budget_docs(spark)
    kept = token_budget_cap(df, "grp", {"a": 30}, "id", F.col("n_tok"))
    rows = kept.collect()
    a_ids = sorted(r["id"] for r in rows if r["grp"] == "a")
    b_ids = sorted(r["id"] for r in rows if r["grp"] == "b")
    # group b uncapped (absent from dict)
    assert b_ids == [6, 7, 8, 9]
    # group a: exactly 3 docs (30 tokens / 10 each), the md5-first ones
    exp = sorted(range(6), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
    assert a_ids == sorted(exp)


def test_token_budget_cap_int_budget_and_boundary(spark):
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.split import token_budget_cap

    df = spark.createDataFrame([Row(id=i, grp="g", n_tok=7) for i in range(5)])
    # budget 21 admits exactly 3 docs (21 == 3*7 inclusive boundary)
    kept = token_budget_cap(df, "grp", 21, "id", F.col("n_tok"))
    assert kept.count() == 3
    # budget smaller than the first doc admits nothing
    assert token_budget_cap(df, "grp", 6, "id", F.col("n_tok")).count() == 0


def test_token_budget_cap_deterministic_and_validated(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pandance_spark.functions.split import token_budget_cap

    df = _budget_docs(spark)
    a = sorted(r["id"] for r in token_budget_cap(df, "grp", 40, "id", F.col("n_tok")).collect())
    b = sorted(
        r["id"]
        for r in token_budget_cap(
            df.repartition(7), "grp", 40, "id", F.col("n_tok")
        ).collect()
    )
    assert a == b
    with _pytest.raises(ValueError):
        token_budget_cap(df, "grp", -1, "id", F.col("n_tok"))
    with _pytest.raises(ValueError):
        token_budget_cap(df, "grp", {"a": -5}, "id", F.col("n_tok"))
    with _pytest.raises(ValueError):
        token_budget_cap(df, "grp", "lots", "id", F.col("n_tok"))


# -------------------------------------------------------- weighted sample
def test_weighted_sample_matches_hand_replay(spark):
    import hashlib
    import math

    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.split import weighted_sample

    rows = [(i, float(1 + (i % 5))) for i in range(40)]
    df = spark.createDataFrame([Row(id=i, w=w) for i, w in rows])
    got = sorted(
        r["id"] for r in weighted_sample(df, "id", F.col("w"), k=10).collect()
    )

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return round((math.log(w) - math.log(-math.log(u))) * 1_000_000)

    exp = sorted(
        sorted(rows, key=lambda t: (-key(*t), t[0]))[:10][i][0] for i in range(10)
    )
    assert got == exp


def test_weighted_sample_excludes_nonfinite_and_null_weights(spark):
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.split import weighted_sample

    df = spark.createDataFrame(
        [
            Row(id=1, w=0.0),
            Row(id=2, w=-3.0),
            Row(id=3, w=None),
            Row(id=4, w=2.0),
            Row(id=5, w=float("nan")),
            Row(id=6, w=float("inf")),
        ]
    )
    got = [r["id"] for r in weighted_sample(df, "id", F.col("w"), k=10).collect()]
    assert got == [4]


def test_weighted_sample_scale_free_and_extreme_weights(spark):
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.split import weighted_sample

    # the sample is invariant under rescaling ALL weights (log-space
    # key) — including magnitudes that would collapse or overflow a
    # direct ln(u)/w micro-snap
    rows = [(i, float(1 + (i % 5))) for i in range(40)]
    base = sorted(
        r["id"]
        for r in weighted_sample(
            spark.createDataFrame([Row(id=i, w=w) for i, w in rows]),
            "id", F.col("w"), k=10,
        ).collect()
    )
    for scale in (1e6, 1e-300):
        scaled = sorted(
            r["id"]
            for r in weighted_sample(
                spark.createDataFrame([Row(id=i, w=w * scale) for i, w in rows]),
                "id", F.col("w"), k=10,
            ).collect()
        )
        assert scaled == base, scale


def test_weighted_sample_heavier_rows_win_more(spark):
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.split import weighted_sample

    # 200 light (w=1) + 200 heavy (w=50): heavy should dominate the sample
    df = spark.createDataFrame(
        [Row(id=i, w=1.0) for i in range(200)]
        + [Row(id=200 + i, w=50.0) for i in range(200)]
    )
    got = [r["id"] for r in weighted_sample(df, "id", F.col("w"), k=50).collect()]
    heavy = sum(1 for i in got if i >= 200)
    assert heavy >= 40


def test_weighted_sample_deterministic_and_validated(spark):
    import pytest as _pytest
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.split import weighted_sample

    df = spark.createDataFrame([Row(id=i, w=float(i + 1)) for i in range(30)])
    a = sorted(r["id"] for r in weighted_sample(df, "id", F.col("w"), 7).collect())
    b = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(11), "id", F.col("w"), 7).collect()
    )
    assert a == b
    with _pytest.raises(ValueError):
        weighted_sample(df, "id", F.col("w"), 0)


# ---------------------------------------------------------- mixture rates
def test_mixture_rates_solver():
    import pytest as _pytest

    from pandance_spark.functions.split import mixture_rates

    # plenty available -> exact shares; short source clips at 1
    r = mixture_rates({"a": 1000, "b": 10, "c": 99}, {"a": 0.5, "b": 0.5}, 100)
    assert r == {"a": 0.05, "b": 1.0}
    # zero-available source keeps rate 1 (harmless: nothing to keep)
    assert mixture_rates({"a": 0}, {"a": 1.0}, 50) == {"a": 1.0}
    with _pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"zz": 0.5}, 100)
    with _pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"a": 1.5}, 100)
    with _pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"a": 0.5}, -1)
    with _pytest.raises(ValueError):
        mixture_rates({"a": -5}, {"a": 0.5}, 100)


def test_weighted_sample_per_group(spark):
    import hashlib
    import math

    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.split import weighted_sample_per_group

    rows = [(i, "a" if i < 20 else "b", float(1 + i % 4)) for i in range(40)]
    df = spark.createDataFrame([Row(id=i, g=g, w=w) for i, g, w in rows])
    out = weighted_sample_per_group(df, "g", "id", F.col("w"), k=5).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["id"])
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return round((math.log(w) - math.log(-math.log(u))) * 1_000_000)

    for g, lo, hi in (("a", 0, 20), ("b", 20, 40)):
        exp = sorted(
            sorted(
                ((i, w) for i, gg, w in rows if gg == g),
                key=lambda t: (-key(*t), t[0]),
            )[:5]
        )
        assert sorted(by_g[g]) == [i for i, _ in exp]


def test_temperature_shares_and_rates():
    from pandance_spark.functions.split import (
        mixture_rates,
        temperature_rates,
        temperature_shares,
    )

    av = {"a": 900, "b": 100}
    # alpha=1 -> proportional; alpha=0 -> uniform over non-empty sources
    assert temperature_shares(av, 1.0) == {"a": 0.9, "b": 0.1}
    assert temperature_shares(av, 0.0) == {"a": 0.5, "b": 0.5}
    # alpha=0.5 flattens: sqrt(900)=30, sqrt(100)=10 -> 0.75/0.25
    assert temperature_shares(av, 0.5) == {"a": 0.75, "b": 0.25}
    # zero-token source contributes no share
    sh = temperature_shares({"a": 100, "z": 0}, 0.5)
    assert sh["z"] == 0.0 and sh["a"] == 1.0
    # rates compose through mixture_rates exactly
    r = temperature_rates(av, 0.5, budget=200)
    assert r == mixture_rates(av, {"a": 0.75, "b": 0.25}, 200)
    assert r["a"] == pytest.approx(150 / 900) and r["b"] == pytest.approx(0.5)
    with pytest.raises(ValueError, match="alpha"):
        temperature_shares(av, 1.5)
    with pytest.raises(ValueError, match=">= 0"):
        temperature_shares({"a": -1}, 0.5)


def test_temperature_rates_empty_source_gets_zero():
    from pandance_spark.functions.split import temperature_rates

    r = temperature_rates({"a": 1000, "z": 0}, 0.5, 500)
    assert r["z"] == 0.0 and 0 < r["a"] <= 1.0


def test_emit_packs_boundaries(spark):
    from pyspark.sql import functions as F

    from pandance_spark.functions.split import emit_packs

    rows = [(i, 10 * (1 + i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = emit_packs(df, "doc_id", "n_tokens", budget=50, n_buckets=4)
    packs = out.collect()
    sizes_total = sum(r["total_tokens"] for r in packs)
    assert sizes_total == sum(s for _, s in rows)
    assert sum(r["n_docs"] for r in packs) == 40
    for r in packs:
        # keys sorted, offsets are the exclusive prefix sums
        assert r["doc_ids"] == sorted(r["doc_ids"])
        run = 0
        for s, o in zip(r["sizes"], r["offsets"]):
            assert o == run
            run += s
        assert run == r["total_tokens"]
        assert abs(r["fill"] - run / 50.0) < 1e-9
        # every doc STARTS within the budget (exclusive cumsum < budget
        # defines the pack; only the tail doc may straddle past it)
        assert all(o < 50 for o in r["offsets"])
    # pack ids within a bucket are contiguous from 0
    from collections import defaultdict
    by_bucket = defaultdict(list)
    for r in packs:
        by_bucket[r["pack_bucket"]].append(r["pack_id"])
    for ids in by_bucket.values():
        assert sorted(ids) == list(range(len(ids)))


def test_interleave_sources_round_robin(spark):
    from pandance_spark.functions.split import interleave_sources

    rows = (
        [(i, "big") for i in range(6)]
        + [(100 + i, "small") for i in range(2)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = interleave_sources(df, "source", "doc_id").orderBy("order_idx")
    got = [(r["source"], r["source_rank"]) for r in out.collect()]
    # round-robin while both sources live (big before small per rank,
    # alphabetical), then big alone once small exhausts
    assert got == [
        ("big", 0), ("small", 0),
        ("big", 1), ("small", 1),
        ("big", 2), ("big", 3), ("big", 4), ("big", 5),
    ]
    idx = [r["order_idx"] for r in out.collect()]
    assert idx == list(range(8))


def test_length_buckets_assignment(spark):
    from pandance_spark.functions.split import length_buckets

    rows = [
        (1, 0),     # clamps to min bucket
        (2, 1),     # log2(1)=0 -> min bucket
        (3, 31),    # ceil(log2(31))=5
        (4, 32),    # exactly 2^5 -> 5
        (5, 33),    # -> 6
        (6, 64),    # -> 6
        (7, 65),    # -> 7
    ]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    out = {
        r["doc_id"]: r["len_bucket"]
        for r in length_buckets(df, "doc_id", "n", batch_size=2).collect()
    }
    assert out == {1: 5, 2: 5, 3: 5, 4: 5, 5: 6, 6: 6, 7: 7}
    # batches: bucket 5 has docs 1,2,3,4 -> batches [0,0,1,1] in id order
    b = {
        r["doc_id"]: r["batch_id"]
        for r in length_buckets(df, "doc_id", "n", batch_size=2).collect()
    }
    assert (b[1], b[2], b[3], b[4]) == (0, 0, 1, 1)
    assert (b[5], b[6]) == (0, 0) and b[7] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        length_buckets(df, "doc_id", "n", batch_size=0)


def test_interleave_shards_equals_total_order(spark):
    """The closed-form sharded interleave must equal the two-window
    interleave_sources on every row, including exhausted-source
    dropout, and stay identical under repartitioning."""
    from pandance_spark.functions.split import (
        interleave_shards,
        interleave_sources,
    )

    rows = (
        [(i, "a") for i in range(7)]
        + [(100 + i, "b") for i in range(3)]
        + [(200 + i, "c") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "k long, src string")
    a = {
        r["k"]: (r["source_rank"], r["order_idx"])
        for r in interleave_sources(df, "src", "k").collect()
    }
    b = {
        r["k"]: (r["source_rank"], r["order_idx"])
        for r in interleave_shards(df, "src", "k").collect()
    }
    assert a == b
    c = {
        r["k"]: (r["source_rank"], r["order_idx"])
        for r in interleave_shards(df.repartition(5), "src", "k").collect()
    }
    assert a == c
    # the order is a permutation 0..n-1 and round-robin at the head
    order = sorted(a.items(), key=lambda kv: kv[1][1])
    assert [kv[1][1] for kv in order] == list(range(len(rows)))
    first_three = [df_row for df_row, _ in order[:3]]
    assert {k < 100 for k in first_three} != {True}  # mixed sources up front


def test_interleave_shards_null_sources_and_type_guard(spark):
    """NULL is a legitimate source partition (sorts FIRST, matching
    interleave_sources' nulls-first window order); non-string source
    columns are rejected with a clear error (the JSON size-table
    literal cannot preserve their ordering)."""
    import pytest

    from pandance_spark.functions.split import (
        interleave_shards,
        interleave_sources,
    )

    rows = [(1, "b"), (2, None), (3, "a"), (4, None), (5, "a")]
    df = spark.createDataFrame(rows, "k long, src string")
    a = {r["k"]: (r["source_rank"], r["order_idx"])
         for r in interleave_sources(df, "src", "k").collect()}
    b = {r["k"]: (r["source_rank"], r["order_idx"])
         for r in interleave_shards(df, "src", "k").collect()}
    assert a == b
    ints = spark.createDataFrame([(1, 10), (2, 9)], "k long, src int")
    with pytest.raises(ValueError, match="string source column"):
        interleave_shards(ints, "src", "k")


@settings(deadline=None, max_examples=25, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(
    demands=st.lists(st.integers(0, 500), min_size=1, max_size=25),
    budget=st.integers(-10, 6000),
)
def test_fair_share_alloc_properties(spark, demands, budget):
    """Water-filling invariants on arbitrary demand sets: alloc never
    exceeds demand, mass conservation (sum(alloc) == min(budget+,
    sum(d)) up to float), monotonicity in demand, and all unsaturated
    groups share one level."""
    from pandance_spark.functions.split import fair_share_alloc

    df = spark.createDataFrame(
        [(f"g{i}", d) for i, d in enumerate(demands)], ["g", "d"]
    )
    got = {r["group"]: r for r in
           fair_share_alloc(df, "g", "d", budget).collect()}
    assert len(got) == len(demands)
    total = sum(demands)
    alloc_sum = sum(r["alloc"] for r in got.values())
    assert all(r["alloc"] <= r["demand"] + 1e-9 for r in got.values())
    assert all(r["alloc"] >= 0.0 for r in got.values())
    expected = min(max(budget, 0), total)
    assert abs(alloc_sum - expected) < 1e-6 * max(1, len(demands))
    # monotone + equal-level for unsaturated
    rows = sorted(got.values(), key=lambda r: (r["demand"], r["group"]))
    for a, b in zip(rows, rows[1:]):
        assert a["alloc"] <= b["alloc"] + 1e-9
    unsat = [r["alloc"] for r in rows if r["alloc"] < r["demand"] - 1e-9]
    assert all(abs(x - unsat[0]) < 1e-6 for x in unsat) if unsat else True
