"""DSIR importance resampling (functions/dsir.py).

Covers: feature counting, weight math (hand-computed micro-units),
target-shaped selection actually preferring target-like documents,
empty/degenerate inputs, and determinism across partitionings.
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandance_spark.functions.dsir import (
    dsir_scores,
    dsir_select,
    dsir_weights,
    hashed_feature_counts,
)
from pandance_spark.functions.split import hash_split_bucket


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    return df.repartition(parts) if parts else df


def test_feature_counts_uni_and_bigram(spark):
    df = _docs(spark, [(1, "a b"), (2, "a")])
    # features: doc1 -> a, b, "a b"; doc2 -> a  (4 total)
    total = (
        hashed_feature_counts(df, "text", buckets=64, ngram=2)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert total == 4


def test_feature_counts_unigram_only(spark):
    df = _docs(spark, [(1, "a b c")])
    total = (
        hashed_feature_counts(df, "text", buckets=64, ngram=1)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert total == 3


def test_weights_hand_computed(spark):
    B = 16
    t = spark.createDataFrame([Row(bucket=0, cnt=3), Row(bucket=1, cnt=1)])
    r = spark.createDataFrame([Row(bucket=0, cnt=1), Row(bucket=2, cnt=5)])
    w = {
        row["bucket"]: row["w_micro"]
        for row in dsir_weights(t, r, buckets=B).collect()
    }
    T, R = 4, 6
    exp = lambda tc, rc: round(
        1e6 * math.log(((tc + 1) * (R + B)) / ((rc + 1) * (T + B)))
    )
    assert w[0] == exp(3, 1)
    assert w[1] == exp(1, 0)  # bucket only in target
    assert w[2] == exp(0, 5)  # bucket only in raw
    assert set(w) == {0, 1, 2}


def test_select_prefers_target_like_docs(spark):
    target = _docs(spark, [(100 + i, "alpha beta gamma") for i in range(5)])
    raw = _docs(
        spark,
        [(i, "alpha beta gamma delta") for i in range(5)]
        + [(10 + i, "xx yy zz qq") for i in range(5)],
    )
    picked = dsir_select(raw, target, "text", "doc_id", k=5, buckets=256)
    ids = {r["doc_id"] for r in picked.collect()}
    assert ids == {0, 1, 2, 3, 4}


def test_scores_keep_empty_docs_at_zero(spark):
    target = _docs(spark, [(9, "alpha")])
    raw = _docs(spark, [(1, ""), (2, "alpha")])
    rows = {
        r["doc_id"]: r
        for r in dsir_scores(raw, target, "text", "doc_id", buckets=32).collect()
    }
    assert rows[1]["score_micro"] == 0 and rows[1]["n_features"] == 0
    assert rows[2]["n_features"] == 1


def test_deterministic_across_partitionings(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} common word here") for i in range(60)]
    target = _docs(spark, [(1000 + i, "tok1 tok2 common") for i in range(4)])
    a = dsir_scores(_docs(spark, rows, parts=1), target, "text", "doc_id", 128)
    b = dsir_scores(_docs(spark, rows, parts=13), target, "text", "doc_id", 128)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_select_ties_break_by_id(spark):
    # identical docs -> identical integer scores -> id asc wins
    target = _docs(spark, [(99, "alpha")])
    raw = _docs(spark, [(i, "alpha") for i in range(6)])
    picked = dsir_select(raw, target, "text", "doc_id", k=3, buckets=32)
    assert {r["doc_id"] for r in picked.collect()} == {0, 1, 2}


def test_validation_errors(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        hashed_feature_counts(df, "text", buckets=1)
    with pytest.raises(ValueError):
        hashed_feature_counts(df, "text", ngram=0)
    with pytest.raises(ValueError):
        dsir_select(df, df, "text", "doc_id", k=0)


def test_bucket_matches_portable_hash(spark):
    # the feature bucket is hash_split_bucket exactly (oracle contract)
    df = spark.createDataFrame([Row(t="hello")])
    direct = df.select(hash_split_bucket(F.col("t"), 1024).alias("b")).collect()[0][
        "b"
    ]
    import hashlib

    exp = int(hashlib.md5(b"hello").hexdigest()[:8], 16) % 1024
    assert direct == exp


def test_fast_path_same_shape_and_signal(spark):
    # xxhash64 bucketing: different buckets, same contract — k rows,
    # target-like docs still win
    target = _docs(spark, [(100 + i, "alpha beta gamma") for i in range(5)])
    raw = _docs(
        spark,
        [(i, "alpha beta gamma delta") for i in range(5)]
        + [(10 + i, "xx yy zz qq") for i in range(5)],
    )
    picked = dsir_select(
        raw, target, "text", "doc_id", k=5, buckets=256, portable=False
    )
    assert {r["doc_id"] for r in picked.collect()} == {0, 1, 2, 3, 4}


def test_score_column_equals_join_path(spark):
    from pandance_spark.functions.dsir import (
        dsir_score_column,
        dsir_weights,
    )

    B = 128
    target = _docs(spark, [(100, "alpha beta gamma"), (101, "alpha beta")])
    raw = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, "xx yy"), (3, ""), (4, "alpha")],
    )
    weights = dsir_weights(
        hashed_feature_counts(target, "text", B),
        hashed_feature_counts(raw, "text", B),
        B,
    ).localCheckpoint()
    join_path = {
        r["doc_id"]: (r["score_micro"], r["n_features"])
        for r in dsir_scores(raw, buckets=B, weights=weights).collect()
    }
    wmap = {r["bucket"]: r["w_micro"] for r in weights.collect()}
    expr_path = {
        r["doc_id"]: (r["s"]["score_micro"], r["s"]["n_features"])
        for r in raw.select(
            "doc_id",
            dsir_score_column(F.col("text"), wmap, buckets=B).alias("s"),
        ).collect()
    }
    assert join_path == expr_path
    # and the map-literal path is a pure projection: zero shuffles —
    # asserted through the library's own plan gate
    from pandance_spark.plans import assert_scalable

    assert_scalable(
        raw.select(dsir_score_column(F.col("text"), wmap, buckets=B).alias("s")),
        max_exchanges=0,
    )


def test_scores_requires_target_or_weights(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        dsir_scores(df, buckets=32)
    from pandance_spark.functions.dsir import dsir_score_column

    with pytest.raises(ValueError):
        dsir_score_column(F.col("t"), {i: 1 for i in range(33)}, buckets=32)
