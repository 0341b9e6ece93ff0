"""Data Selection with Importance Resampling (DSIR).

Extension surface (SURVEY.md §2.4 — training-data pipeline).  DSIR
(Xie et al., "Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169) selects raw-corpus documents whose
hashed n-gram distribution looks like a small trusted TARGET corpus:
estimate bucketed feature distributions p (target) and q (raw), score
each raw document by its importance log-ratio sum

    log w(x) = sum over features f in x of  [ log p(f) - log q(f) ]

and keep the top-weighted (or Gumbel-resampled) documents.  It is the
published, widely replicated recipe for "give me web data shaped like
Wikipedia/books" and slots in front of the quality classifier
(functions/text.py hashed_quality_score) in a curation pipeline.  The
reference engine has no analog (pandance is joins-only); this is pure
extension surface.

Spark-first shape
-----------------
Both distribution estimates are ONE tokenize projection + explode +
hash aggregation with map-side partial combine — the shuffle carries
at most ``buckets`` partial counts per input partition, never raw
tokens.  The weight table is ``buckets`` rows (fits in a broadcast at
any corpus size — the whole point of feature hashing), joined
broadcast onto the exploded raw corpus; per-document scores come from
one groupBy(id) whose map-side combine collapses each document's
features inside its own partition (explode preserves row locality),
so the score shuffle carries exactly one row per document.  Selection
is ``TakeOrderedAndProject`` (top-k without a global sort).

Determinism / oracle
--------------------
Feature bucketing is the portable md5 bucket (hash_split_bucket) and
the per-bucket log-ratio is snapped to INTEGER MICRO-UNITS
(round(1e6 * ln(ratio))) before any per-document summation, so
document scores are exact integer arithmetic — bit-identical across
engines, partitionings and summation orders.  The ratio itself is a
single IEEE division of exact integers, so the only float op per
bucket is one ln() — a last-ulp discrepancy between libm
implementations would have to land within ~1e-10 of a rounding
boundary to flip a micro-unit.

At 100 TB: the raw corpus is scanned once for q and once for scoring
(share a cached/checkpointed token projection if both run in one
job); the target corpus is small by construction.  Nothing about the
plan changes with corpus size — the weight table stays ``buckets``
rows.  Every function takes ``portable=False`` to swap the md5
oracle bucket for xxhash64 (measured ~1.3-1.8x end-to-end,
SCALING.md r06e) — same plan, same guarantees except cross-engine
replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandance_spark.functions.split import (
    hash_split_bucket,
    hash_split_bucket_fast,
)
from pandance_spark.functions.text import tokenize, word_shingles_from_tokens

__all__ = [
    "hashed_feature_counts",
    "dsir_weights",
    "dsir_scores",
    "dsir_score_column",
    "dsir_select",
]


def _feature_buckets(text, buckets: int, ngram: int, portable: bool = True):
    """Array column of hashed feature buckets for one document: word
    unigrams plus n-grams up to ``ngram``, each bucketed into
    [0, buckets).  Pure per-row computation — no shuffle.

    ``portable=True`` buckets via md5 (cross-engine reproducible — the
    oracle contract); ``portable=False`` via xxhash64 — cheaper per
    feature, measured ~1.3-1.8x end-to-end at 2M docs (the explode
    and tokenize dominate, not the hash; same trade as
    hash_split_bucket_fast)."""
    bucket = hash_split_bucket if portable else hash_split_bucket_fast
    toks = tokenize(text)
    feats = toks
    for n in range(2, ngram + 1):
        feats = F.concat(feats, word_shingles_from_tokens(toks, n))
    return F.transform(feats, lambda t: bucket(t, buckets))


def hashed_feature_counts(
    df: DataFrame,
    text_col: str,
    buckets: int = 10_000,
    ngram: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Bucketed feature counts ``(bucket, cnt)`` over a corpus.

    One explode + one map-side-combining aggregation; the shuffle
    carries at most ``buckets`` partial rows per input partition.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    return (
        df.select(
            F.explode(
                _feature_buckets(F.col(text_col), buckets, ngram, portable)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    target_counts: DataFrame, raw_counts: DataFrame, buckets: int = 10_000
) -> DataFrame:
    """Per-bucket importance log-ratio in integer micro-units.

    ``(bucket, w_micro)`` where
    ``w_micro = round(1e6 * ln( p_hat(b) / q_hat(b) ))`` with add-one
    smoothing: ``p_hat(b) = (t_b + 1) / (T + buckets)`` and likewise
    for q.  Both totals are computed in-plan from the same count
    tables (no separate eager pass — the counts-vs-total consistency
    lesson from skew_report applies here too), as WINDOW sums over the
    joined <= ``buckets``-row count table rather than separate
    aggregate branches: a standalone ``counts.agg(sum)`` subquery
    re-evaluates the whole corpus tokenize/explode/count subtree a
    second time per side (guide §2.4 duplicated-subtree class —
    measured as 4 extra corpus scans in dsir_select's r11 before-plan),
    while the window form reads each count table once and sums the
    bucket rows it already has.  Everything is ``buckets`` rows end to
    end.
    """
    from pyspark.sql import Window

    joined = target_counts.withColumnRenamed("cnt", "t_cnt").join(
        raw_counts.withColumnRenamed("cnt", "r_cnt"), "bucket", "full_outer"
    )
    # bucket rows are unique per side (groupBy output), so the window
    # sums over the full-outer join equal the per-side totals exactly
    wall = Window.partitionBy()
    joined = joined.select(
        "bucket",
        "t_cnt",
        "r_cnt",
        F.coalesce(F.sum("t_cnt").over(wall), F.lit(0)).alias("t_total"),
        F.coalesce(F.sum("r_cnt").over(wall), F.lit(0)).alias("r_total"),
    )
    t_cnt = F.coalesce(F.col("t_cnt"), F.lit(0))
    r_cnt = F.coalesce(F.col("r_cnt"), F.lit(0))
    b = F.lit(buckets)
    # each factor is cast to double BEFORE the multiply: a bigint
    # product (t_cnt+1)*(r_total+B) overflows int64 once a hot bucket
    # count times the other corpus's token total passes 2^63 — real at
    # the 100 TB scale this module targets (ANSI mode would fail the
    # job; non-ANSI engines would wrap silently).  Factors below 2^53
    # keep the double products exact, so the micro-unit snap is
    # unchanged at oracle-testable scales.
    ratio = (
        (t_cnt + 1).cast("double") * (F.col("r_total") + b).cast("double")
    ) / ((r_cnt + 1).cast("double") * (F.col("t_total") + b).cast("double"))
    return joined.select(
        "bucket", F.round(F.log(ratio) * 1_000_000).cast("long").alias("w_micro")
    )


def dsir_scores(
    raw_df: DataFrame,
    target_df: DataFrame = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    ngram: int = 2,
    portable: bool = True,
    weights: DataFrame = None,
) -> DataFrame:
    """Per-document DSIR importance score ``(id_col, score_micro,
    n_features)`` — integer micro-units, exact across engines.

    Documents with zero features (empty text) score 0 on no features
    and are kept in the output so selection policy stays with the
    caller.

    Pass ``weights`` (a ``dsir_weights`` table) to score against a
    FIXED, previously estimated distribution — the production pattern
    for scoring new data without re-estimating q from it; then
    ``target_df`` is unused.  Buckets absent from the table score 0,
    matching the estimate-from-this-corpus path where every scored
    bucket exists by construction.
    """
    if weights is None:
        if target_df is None:
            raise ValueError("provide target_df or a precomputed weights table")
        t_counts = hashed_feature_counts(
            target_df, text_col, buckets, ngram, portable
        )
        r_counts = hashed_feature_counts(raw_df, text_col, buckets, ngram, portable)
        weights = dsir_weights(t_counts, r_counts, buckets)
    exploded = raw_df.select(
        F.col(id_col),
        F.explode_outer(
            _feature_buckets(F.col(text_col), buckets, ngram, portable)
        ).alias("bucket"),
    )
    # weight table is <= buckets rows by construction: broadcast
    return (
        exploded.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("w_micro"), F.lit(0)).alias("score_micro"),
            F.count(F.col("bucket")).alias("n_features"),
        )
    )


def dsir_score_column(
    text,
    weight_map: dict,
    buckets: int = 10_000,
    ngram: int = 2,
    portable: bool = True,
):
    """MAP-ONLY DSIR score: a struct Column ``(score_micro,
    n_features)`` computed per row from a driver-side weight dict —
    no explode, no join, no shuffle.

    ``weight_map`` is {bucket: w_micro}, at most ``buckets`` entries
    by construction (collect a ``dsir_weights`` table — the same
    bounded-by-contract move as the Bloom bitmap broadcast).  The dict
    is compiled into the plan as ONE ``from_json`` map literal that
    Catalyst constant-folds (the const_vectors trick), so scoring is
    a pure projection: this is what lets a STREAMING query score
    documents statelessly, and what a 100 TB batch pass uses to avoid
    re-shuffling the corpus when the weights are already known.
    Buckets absent from the map score 0 (same semantics as the join
    path); NULL text scores 0 on 0 features (same as dsir_scores).
    """
    import json

    if len(weight_map) > buckets:
        raise ValueError("weight_map has more entries than buckets")
    payload = json.dumps({str(int(k)): int(v) for k, v in weight_map.items()})
    m = F.from_json(F.lit(payload), "map<string,bigint>")
    feats = _feature_buckets(text, buckets, ngram, portable)
    per_feat = F.transform(
        feats,
        lambda b: F.coalesce(F.element_at(m, b.cast("string")), F.lit(0)),
    )
    score = F.coalesce(
        F.aggregate(
            per_feat, F.lit(0).cast("long"), lambda acc, w: acc + w
        ),
        F.lit(0).cast("long"),
    )
    n = F.coalesce(F.size(feats), F.lit(0)).cast("long")
    return F.struct(
        score.alias("score_micro"),
        F.when(n < 0, F.lit(0)).otherwise(n).alias("n_features"),
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    buckets: int = 10_000,
    ngram: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR importance score.

    Deterministic: integer scores, ties broken by ``id_col``.  The
    selection compiles to ``TakeOrderedAndProject`` (no global sort);
    the k winners broadcast-join back to the raw corpus for their
    payload columns, so full rows never ride through the explode.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    scores = dsir_scores(
        raw_df, target_df, text_col, id_col, buckets, ngram, portable
    )
    top = scores.orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    ).limit(k)
    return raw_df.join(F.broadcast(top), id_col, "inner")
