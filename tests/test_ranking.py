"""bm25_topk: hand-computed scores on a tiny corpus + invariants."""

import math

import pytest
from pyspark.sql import functions as F

from pandance_spark.functions.ranking import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, "elderberry fig"),
        ],
        "doc_id long, text string",
    )


def _bm25_hand(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in docs}
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    df = {}
    for t in terms:
        df[t] = sum(1 for v in toks.values() if t in v)
    scores = {}
    for d, v in toks.items():
        s = 0.0
        dl = len(v)
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        if s > 0:
            scores[d] = round(s, 6)
    return scores


def test_matches_hand_computation(spark, corpus):
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expected = _bm25_hand(docs, ["apple", "cherry"])
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(corpus, "doc_id", "text", ["apple", "cherry"], k=10).collect()
    }
    assert got == pytest.approx(expected)


def test_rank_order_and_k(spark, corpus):
    out = bm25_topk(corpus, "doc_id", "text", ["cherry"], k=1).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 3  # most cherry-heavy document
    assert out[0]["rank"] == 1


def test_no_match_docs_omitted(spark, corpus):
    out = bm25_topk(corpus, "doc_id", "text", ["apple"], k=10).collect()
    assert sorted(r["doc_id"] for r in out) == [1]


def test_empty_terms_raises(spark, corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "doc_id", "text", [])


def test_terms_case_normalized(spark, corpus):
    lo = bm25_topk(corpus, "doc_id", "text", ["apple"], k=10).collect()
    hi = bm25_topk(corpus, "doc_id", "text", ["APPLE"], k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in lo] == [
        (r["doc_id"], r["score"]) for r in hi
    ]


# ----------------------------------------------------------------- tf-idf
def test_keywords_tfidf_hand_computed(spark):
    import math

    from pyspark.sql import Row

    from pandance_spark.functions.ranking import keywords_tfidf

    docs = spark.createDataFrame(
        [
            Row(id=1, t="apple apple banana common"),
            Row(id=2, t="banana common"),
            Row(id=3, t="cherry common"),
        ]
    )
    out = keywords_tfidf(docs, "id", "t", k=2).collect()
    rows = {(r["id"], r["rank"]): (r["term"], r["tf"], r["score_micro"]) for r in out}
    idf = lambda df: round(1e6 * math.log((3 + 1) / (df + 1)))
    # doc 1: apple tf=2 rare -> top; banana second
    assert rows[(1, 1)] == ("apple", 2, 2 * idf(1))
    assert rows[(1, 2)] == ("banana", 1, idf(2))
    # doc 3: cherry beats the everywhere-term 'common'
    assert rows[(3, 1)] == ("cherry", 1, idf(1))
    assert rows[(3, 2)] == ("common", 1, idf(3))
    assert len(out) == 6


def test_keywords_tfidf_tie_breaks_by_term(spark):
    from pyspark.sql import Row

    from pandance_spark.functions.ranking import keywords_tfidf

    docs = spark.createDataFrame([Row(id=1, t="zeta alpha"), Row(id=2, t="alpha zeta")])
    out = keywords_tfidf(docs, "id", "t", k=1).collect()
    assert {(r["id"], r["term"]) for r in out} == {(1, "alpha"), (2, "alpha")}


def test_keywords_tfidf_validation(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from pandance_spark.functions.ranking import keywords_tfidf

    docs = spark.createDataFrame([Row(id=1, t="a")])
    with _pytest.raises(ValueError):
        keywords_tfidf(docs, "id", "t", k=0)
