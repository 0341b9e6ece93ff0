"""Deterministic hash-split tests (training-pipeline primitive)."""

import pytest
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
