"""Text ranking: BM25 scoring over a document corpus.

Extension surface (SURVEY.md §2.4 — text analysis): retrieval-style
scoring used by training-data pipelines for query-based corpus
selection (e.g. pulling documents relevant to a benchmark topic or a
seed description).

Spark-first shape
-----------------
One tokenize projection, one explode, two hash aggregations (term
frequency per (doc, term) and document frequency per term — both with
map-side partial combine), one broadcast join of the tiny per-term idf
table, one final per-doc sum.  No Python in the loop, no window over
the full corpus — the only global agg is the 2-scalar (N, avgdl)
corpus-stats row, which is crossJoin-broadcast.

At 100 TB: the explode's width is bounded by filtering to the query's
terms BEFORE the shuffle (the term filter is pushed into the same map
stage as tokenize), so shuffle volume is proportional to matches, not
corpus tokens.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandance_spark.functions.text import tokenize

__all__ = ["bm25_topk", "keywords_tfidf"]


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Returns ``(id_col, score, rank)``, rank 1..k, score rounded to 6
    decimals, ties broken by document id.  Standard Okapi BM25:

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d)    = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with N the corpus size, dl the document token count, avgdl its
    corpus mean.  Documents matching no term are omitted.
    """
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    tok = docs.select(
        F.col(id_col).alias("__id"), tokenize(F.col(text_col)).alias("__toks")
    )
    with_dl = tok.select("__id", "__toks", F.size("__toks").alias("__dl"))

    # corpus stats: one 2-scalar row, broadcast into every partition
    stats = with_dl.agg(
        F.count(F.lit(1)).alias("__N"),
        F.avg(F.col("__dl").cast("double")).alias("__avgdl"),
    )

    term_arr = F.array(*[F.lit(t) for t in terms])
    # filter to query terms BEFORE exploding: shuffle carries only
    # matching tokens
    matches = with_dl.select(
        "__id",
        "__dl",
        F.explode(
            F.filter(F.col("__toks"), lambda t: F.array_contains(term_arr, t))
        ).alias("__term"),
    )
    tf = matches.groupBy("__id", "__term").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )
    df_t = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    scored = (
        tf.join(F.broadcast(df_t), "__term")
        .crossJoin(F.broadcast(stats))
        .select(
            "__id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("__N") - F.col("__df") + 0.5)
                    / (F.col("__df") + 0.5)
                )
                * (F.col("__tf") * (k1 + 1))
                / (
                    F.col("__tf")
                    + k1
                    * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy("__id")
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k + driver merge — no global sort shuffle); the rank window
    # then runs over k rows only
    top = scored.orderBy(F.col("score").desc(), F.col("__id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("__id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("__id").alias(id_col), "score", "rank"
    )


def keywords_tfidf(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-document top-``k`` salient terms by tf-idf —
    ``(id_col, term, tf, score_micro, rank)``.

    The classic corpus-exploration / weak-labeling pass: what is each
    document about, without a model.  Scores are exact integers:
    ``idf_micro = round(1e6 * ln((N + 1) / (df + 1)))`` snapped per
    term (one ln on an exact integer ratio), then
    ``score_micro = tf * idf_micro`` — bit-reproducible across
    engines, partitionings and summation orders, same micro-unit
    pattern as DSIR.  Ties break by term.

    Spark-first shape: ONE tokenize+explode, tf from a map-side-
    combining groupBy (doc, term); df and N derived from the SAME
    (doc, term) table (distinct-doc counts per term + an in-plan
    1-row N) so every number sees one snapshot of the corpus; idf is
    a term-keyed table joined back (broadcast when the vocabulary
    fits, shuffle-join otherwise — Catalyst/AQE picks by size); the
    final per-doc top-k is a rank window partitioned by document, so
    no global sort.  Shuffle volume is proportional to distinct
    (doc, term) pairs, never raw tokens.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # pairs feeds THREE consumers (N, df, the scored join): without a
    # barrier the tokenize+explode+groupBy subtree evaluates once per
    # consumer — 3 corpus scans in the r11 before-plan (guide §2.4).
    # The checkpoint is (doc, term)-distinct-sized, far below raw
    # tokens, and makes the docstring's "ONE tokenize+explode" true.
    pairs = (
        docs.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = pairs.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("__n")
    )
    idf = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(
                F.log(
                    (F.col("__n") + 1).cast("double") / (F.col("df") + 1)
                )
                * 1_000_000
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    scored = pairs.join(idf, "term").select(
        id_col,
        "term",
        "tf",
        (F.col("tf") * F.col("idf_micro")).alias("score_micro"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
