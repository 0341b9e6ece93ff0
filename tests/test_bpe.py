"""BPE learn/apply: pure-Python Sennrich replay parity, reconstruction,
determinism, and the distributed word-count contract."""
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pandance_spark.functions.bpe import (
    END_OF_WORD,
    _encode_word,
    bpe_segment,
    learn_bpe,
    word_counts,
)
from pandance_spark.functions.text import tokenize

CORPUS = [
    "low lower lowest low low",
    "newer newest new new newer",
    "widest wider wide widest",
    "low newer lowest widest",
]


def _ref_encode(word, merges):
    """Independent reference: replay merges in LEARNED order (the
    original Sennrich apply).  The library uses GPT-2 rank-greedy;
    the two must agree on every word."""
    sym = list(word) + [END_OF_WORD]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_word_counts_matches_python(spark, corpus_df):
    got = {
        r["word"]: r["cnt"] for r in word_counts(corpus_df, "text").collect()
    }
    want = {}
    for t in CORPUS:
        for w in t.split():
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_learn_is_deterministic_across_partitionings(spark, corpus_df):
    m1 = learn_bpe(corpus_df, "text", num_merges=30, vocab_cap=100)
    m2 = learn_bpe(
        corpus_df.repartition(7), "text", num_merges=30, vocab_cap=100
    )
    assert m1 == m2
    assert len(m1) > 0


def test_rank_greedy_equals_in_order_replay(spark, corpus_df):
    merges = learn_bpe(corpus_df, "text", num_merges=30, vocab_cap=100)
    ranks = {p: i for i, p in enumerate(merges)}
    words = sorted({w for t in CORPUS for w in t.split()})
    words += ["unseen", "lowestest", "a", "zzz"]
    for w in words:
        assert _encode_word(w, ranks, merges) == _ref_encode(w, merges), w


def test_segment_reconstructs_and_counts(spark, corpus_df):
    merges = learn_bpe(corpus_df, "text", num_merges=30, vocab_cap=100)
    words = tokenize(F.col("text"))
    out = corpus_df.select(
        "doc_id",
        words.alias("words"),
        bpe_segment(words, merges).alias("toks"),
    ).collect()
    for r in out:
        joined = "".join(r["toks"])
        want = "".join(w + END_OF_WORD for w in r["words"])
        assert joined == want
        # every word contributes >= 1 token
        assert len(r["toks"]) >= len(r["words"])


def test_vocab_cap_deterministic_tiebreak(spark):
    # words with EQUAL counts: the cap must keep the lexicographically
    # smallest ones, independent of partitioning
    df = spark.createDataFrame(
        [(0, "bb aa dd cc")], ["doc_id", "text"]
    )
    kept = {
        r["word"]
        for r in word_counts(df, "text", limit=2).collect()
    }
    assert kept == {"aa", "bb"}


def test_min_pair_count_stops_singletons(spark):
    # every word unique, every pair count 1 -> zero merges learned
    df = spark.createDataFrame([(0, "abc defg hij")], ["doc_id", "text"])
    assert learn_bpe(df, "text", num_merges=10) == []


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_property_encode_reconstructs(words):
    # build merges from the word list itself via the driver-side loop
    # semantics: any learned merge table must reconstruct any word
    freq = {}
    for w in words:
        freq[w] = freq.get(w, 0) + 1
    # learn directly with the private pieces: emulate via corpus on a
    # tiny in-memory pass (no Spark needed for the property)
    merges = []
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in freq.items()}
    for _ in range(20):
        pairs = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best_cnt = max(pairs.values())
        if best_cnt < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_cnt)
        merges.append(best)
        new = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(words):
        enc = _encode_word(w, ranks, merges)
        assert "".join(enc) == w + END_OF_WORD
        assert enc == _ref_encode(w, merges)
