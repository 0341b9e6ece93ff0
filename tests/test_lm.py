"""Unigram LM cross-entropy scoring (functions/lm.py).

Brute-force oracle: recompute token probabilities with Python floats
over the same tokenization and compare per-document bits/token.
"""

import math
import re

import pytest
from pyspark.sql import functions as F

from pandance_spark.functions.lm import lm_cross_entropy, unigram_counts


def _py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the the the the the"),
    (3, "zx qv jk wp"),  # rare tokens -> highest cross-entropy
    (4, "the quick dog"),
    (5, ""),  # zero tokens -> omitted
]


def _brute_ce(docs, add_k=1.0):
    from collections import Counter

    counts = Counter(t for _, txt in docs for t in _py_tokens(txt))
    N, V = sum(counts.values()), len(counts)
    out = {}
    for i, txt in docs:
        toks = _py_tokens(txt)
        if not toks:
            continue
        bits = [
            -math.log2((counts[t] + add_k) / (N + add_k * (V + 1)))
            for t in toks
        ]
        out[i] = (len(toks), sum(bits) / len(bits))
    return out


def test_self_trained_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["perplexity"])
        for r in lm_cross_entropy(df, "doc_id", "text").collect()
    }
    want = _brute_ce(DOCS)
    assert set(got) == set(want)  # doc 5 omitted
    for i, (n, ce) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(ce, abs=1e-6)
        assert got[i][2] == pytest.approx(2 ** ce, abs=1e-4)
    # gibberish scores strictly worse than common-token docs
    assert got[3][1] > got[1][1] > got[2][1]


def test_cross_corpus_oov_smoothing(spark):
    train = spark.createDataFrame(DOCS[:2], "doc_id int, text string")
    score = spark.createDataFrame(
        [(10, "the fox"), (11, "unseen wordsxyz")], "doc_id int, text string"
    )
    counts = unigram_counts(train, "text")
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_cross_entropy(score, "doc_id", "text", counts=counts).collect()
    }
    # all-OOV doc gets the uniform OOV bucket mass, strictly worse
    assert got[11] > got[10]
    from collections import Counter

    c = Counter(t for _, txt in DOCS[:2] for t in _py_tokens(txt))
    N, V = sum(c.values()), len(c)
    want = -math.log2(1.0 / (N + V + 1))  # c(t)=0, k=1
    assert got[11] == pytest.approx(want, abs=1e-6)


def test_vocab_size_truncation_deterministic(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    top2 = unigram_counts(df, "text", vocab_size=2).collect()
    # 'the' dominates; second slot resolved by (count desc, token asc)
    assert top2[0]["token"] == "the"
    assert len(top2) == 2
    all_counts = {
        r["token"]: r["cnt"] for r in unigram_counts(df, "text").collect()
    }
    runner_up = sorted(all_counts.items(), key=lambda kv: (-kv[1], kv[0]))[1]
    assert (top2[1]["token"], top2[1]["cnt"]) == runner_up


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        lm_cross_entropy(df, "doc_id", "text", add_k=0.0)
    with pytest.raises(ValueError):
        unigram_counts(df, "text", vocab_size=0)


def test_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = lm_cross_entropy(docs, "doc_id", "text")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["cross_entropy"] > 0 for r in rows)
    # deterministic across evaluations
    again = {r["doc_id"]: r["cross_entropy"] for r in out.collect()}
    assert {r["doc_id"]: r["cross_entropy"] for r in rows} == again


def _brute_bigram_ce(docs, add_k=1.0):
    from collections import Counter

    pairs = Counter()
    for _, txt in docs:
        toks = _py_tokens(txt)
        prevs = ["<s>"] + toks[:-1]
        pairs.update(zip(prevs, toks))
    ctx = Counter()
    for (p, _), c in pairs.items():
        ctx[p] += c
    V = len({t for _, t in pairs})
    out = {}
    for i, txt in docs:
        toks = _py_tokens(txt)
        if not toks:
            continue
        prevs = ["<s>"] + toks[:-1]
        bits = [
            -math.log2(
                (pairs[(p, t)] + add_k) / (ctx[p] + add_k * (V + 1))
            )
            for p, t in zip(prevs, toks)
        ]
        out[i] = (len(toks), sum(bits) / len(bits))
    return out


def test_bigram_matches_brute_force(spark):
    from pandance_spark.functions.lm import lm_cross_entropy_bigram

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in lm_cross_entropy_bigram(df, "doc_id", "text").collect()
    }
    want = _brute_bigram_ce(DOCS)
    assert set(got) == set(want)
    for i, (n, ce) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(ce, abs=1e-6)


def test_bigram_context_sensitivity(spark):
    from pandance_spark.functions.lm import (
        bigram_counts,
        lm_cross_entropy_bigram,
    )

    # 'a b' always; 'a c' never: the bigram model must prefer in-context
    train = spark.createDataFrame(
        [(i, "a b a b a b") for i in range(5)], "doc_id int, text string"
    )
    bg = bigram_counts(train, "text")
    score = spark.createDataFrame(
        [(100, "a b a b"), (101, "b a b a"), (102, "a a b b")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_cross_entropy_bigram(
            score, "doc_id", "text", bigrams=bg
        ).collect()
    }
    assert got[100] < got[102]  # in-context transitions beat violations


def test_id_col_named_token_no_collision(spark):
    from pandance_spark.functions.lm import (
        lm_cross_entropy,
        lm_cross_entropy_bigram,
    )

    # id column named after the model's public column names must work
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b b c")], "token int, text string"
    )
    out = lm_cross_entropy(df, "token", "text").collect()
    assert {r["token"] for r in out} == {1, 2}
    out2 = lm_cross_entropy_bigram(df, "token", "text").collect()
    assert {r["token"] for r in out2} == {1, 2}


# ---------------------------------------------------------------- buckets
def test_ppl_buckets_tiers_and_determinism(spark):
    from pyspark.sql import Row

    from pandance_spark.functions.lm import ppl_buckets

    # 6 docs per group: 2 fluent (low self-ppl via common tokens),
    # 2 mid, 2 gibberish (rare tokens)
    rows = []
    for g in ("a", "b"):
        for i in range(2):
            rows.append(Row(id=f"{g}lo{i}", grp=g, t="the the the cat cat"))
        for i in range(2):
            rows.append(Row(id=f"{g}mid{i}", grp=g, t="the cat sat on mat"))
        for i in range(2):
            rows.append(Row(id=f"{g}hi{i}", grp=g, t=f"zq{g}{i} xv{g}{i} wk{g}{i}"))
    df = spark.createDataFrame(rows)
    out = ppl_buckets(df, "id", "t", group_col="grp", n_buckets=3)
    got = {r["id"]: r["bucket"] for r in out.collect()}
    for g in ("a", "b"):
        assert got[f"{g}lo0"] == got[f"{g}lo1"] == 1
        assert got[f"{g}hi0"] == got[f"{g}hi1"] == 3
    # stable across partitionings
    got2 = {
        r["id"]: r["bucket"]
        for r in ppl_buckets(
            df.repartition(7), "id", "t", group_col="grp", n_buckets=3
        ).collect()
    }
    assert got == got2


def test_ppl_buckets_global_and_validation(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from pandance_spark.functions.lm import ppl_buckets

    df = spark.createDataFrame(
        [Row(id=i, t="a b c") for i in range(4)] + [Row(id=9, t="")]
    )
    out = ppl_buckets(df, "id", "t", n_buckets=2).collect()
    # zero-token doc omitted (lm_cross_entropy contract); 4 docs -> 2+2
    assert sorted(r["bucket"] for r in out) == [1, 1, 2, 2]
    with _pytest.raises(ValueError):
        ppl_buckets(df, "id", "t", n_buckets=0)


def test_oov_stats_counts_and_edge_cases(spark):
    from pandance_spark.functions.lm import oov_stats

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple durian durian"),
            (3, "!!! ..."),          # tokenless
            (4, None),               # NULL text
        ],
        ["doc_id", "text"],
    )
    vocab = spark.createDataFrame(
        [("apple",), ("banana",), ("cherry",), ("apple",)], ["token"]
    )
    out = {r["doc_id"]: r for r in oov_stats(docs, "text", vocab).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (3, 0)
    assert out[1]["oov_rate"] == 0.0
    # duplicate OOV tokens each count; duplicate vocab rows collapse
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (3, 2)
    assert abs(out[2]["oov_rate"] - 2 / 3) < 1e-9
    # tokenless and NULL documents still report, rate 0
    for k in (3, 4):
        assert (out[k]["n_tokens"], out[k]["n_oov"], out[k]["oov_rate"]) \
            == (0, 0, 0.0)


def test_vocab_coverage_curve_ranks_and_coverage(spark):
    from pandance_spark.functions.lm import vocab_coverage_curve

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z")], ["doc_id", "text"]
    )
    rows = vocab_coverage_curve(docs, "text").collect()
    assert [r["token"] for r in rows] == ["a", "b", "c", "z"]
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    assert [r["n_occurrences"] for r in rows] == [4, 3, 1, 1]
    assert [r["cum_occurrences"] for r in rows] == [4, 7, 8, 9]
    assert abs(rows[-1]["coverage"] - 1.0) < 1e-12
    assert abs(rows[0]["coverage"] - 4 / 9) < 1e-9
    # ties break on token asc: c before z
    top2 = vocab_coverage_curve(docs, "text", top_v=2).collect()
    assert [r["token"] for r in top2] == ["a", "b"]


def _brute_kn_ce(docs, train=None, discount=0.75, add_k=1.0):
    from collections import Counter, defaultdict

    train = docs if train is None else train
    big = Counter()
    for _, txt in train:
        toks = _py_tokens(txt)
        for p, t in zip(["<s>"] + toks[:-1], toks):
            big[(p, t)] += 1
    ctx = defaultdict(int)
    n1p = defaultdict(int)
    n1c = defaultdict(int)
    for (p, t), c in big.items():
        ctx[p] += c
        n1p[p] += 1
        n1c[t] += 1
    T = len(big)
    V = len({t for _, t in big})

    def pcont(t):
        return (n1c.get(t, 0) + add_k) / (T + add_k * (V + 1))

    out = {}
    for i, txt in docs:
        toks = _py_tokens(txt)
        if not toks:
            continue
        bits = []
        for p, t in zip(["<s>"] + toks[:-1], toks):
            if ctx.get(p, 0) > 0:
                prob = (
                    max(big.get((p, t), 0) - discount, 0.0)
                    + discount * n1p[p] * pcont(t)
                ) / ctx[p]
            else:
                prob = pcont(t)
            bits.append(-math.log2(prob))
        out[i] = (len(bits), sum(bits) / len(bits))
    return out


def test_kn_matches_brute_force(spark):
    from pandance_spark.functions.lm import lm_cross_entropy_kn

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in lm_cross_entropy_kn(df, "doc_id", "text").collect()
    }
    want = _brute_kn_ce(DOCS)
    assert set(got) == set(want)
    for i, (n, ce) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(ce, abs=1e-6)
    # probabilities stay a distribution: every doc scores finite bits
    assert all(ce == ce and ce > 0 for _, (_, ce) in want.items())


def test_kn_continuation_beats_frequency(spark):
    """The canonical KN motivation: 'francisco' appears MANY times but
    only after 'san'; 'day' appears the same number of times across
    diverse contexts.  After an unseen context, add-k backoff scores
    them by frequency (tie), while KN scores 'day' far more likely —
    context diversity, not raw count."""
    from pandance_spark.functions.lm import (
        bigram_counts,
        lm_cross_entropy_bigram,
        lm_cross_entropy_kn,
    )

    train = [
        (0, "san francisco " * 6 +
            "one day two day red day blue day new day old day"),
    ]
    tdf = spark.createDataFrame(train, "doc_id int, text string")
    big = bigram_counts(tdf, "text")
    # score single-token docs in an unseen context ('zzz' prefix
    # forces backoff for the SECOND token)
    probe = spark.createDataFrame(
        [(1, "zzz francisco"), (2, "zzz day")], "doc_id int, text string"
    )
    kn = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_cross_entropy_kn(
            probe, "doc_id", "text", bigrams=big
        ).collect()
    }
    addk = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_cross_entropy_bigram(
            probe, "doc_id", "text", bigrams=big
        ).collect()
    }
    # both tokens occur 6x -> add-k sees them as equally likely
    assert addk[1] == pytest.approx(addk[2], abs=1e-6)
    # KN: 'day' follows 6 distinct contexts, 'francisco' only 1
    assert kn[2] < kn[1] - 0.5


def test_ppl_buckets_kn_moves_tier_boundary(spark):
    """ppl_buckets(scorer='kn') re-ranks documents the unigram scorer
    cannot distinguish: docs made of frequent-but-single-context
    tokens drop tiers under KN."""
    from pandance_spark.functions.lm import ppl_buckets

    # corpus: 'san francisco' pairs + diverse 'day' contexts + filler
    docs = (
        [(i, "san francisco city") for i in range(4)]
        + [(10 + i, f"ctx{i} day park") for i in range(4)]
        + [(20 + i, "zx qv jk") for i in range(2)]
    )
    df = spark.createDataFrame(docs, "doc_id int, text string")
    uni = {
        r["doc_id"]: r["bucket"]
        for r in ppl_buckets(df, "doc_id", "text", n_buckets=3).collect()
    }
    kn = {
        r["doc_id"]: r["bucket"]
        for r in ppl_buckets(
            df, "doc_id", "text", n_buckets=3, scorer="kn"
        ).collect()
    }
    assert set(uni) == set(kn)
    moved = [i for i in uni if uni[i] != kn[i]]
    assert moved, "KN must move at least one document across a tier"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="scorer"):
        ppl_buckets(df, "doc_id", "text", scorer="katz")


def test_kn_validation(spark):
    from pandance_spark.functions.lm import lm_cross_entropy_kn

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError, match="discount"):
        lm_cross_entropy_kn(df, "doc_id", "text", discount=1.0)
    with pytest.raises(ValueError, match="add_k"):
        lm_cross_entropy_kn(df, "doc_id", "text", add_k=0.0)
