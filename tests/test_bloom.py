"""Bloom-accelerated incremental dedup (operators/bloom.py).

The contract under test: bloom_dedup(batch, index, on) returns EXACTLY
batch.join(index, on, "left_anti") — same rows, duplicates and NULL
keys included — while the plan probes a broadcast word table first.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandance_spark.operators.bloom import (
    _bloom_params,
    bloom_dedup,
    bloom_words,
)


def _rows(df, cols):
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _anti(batch, index, on):
    cols = [on] if isinstance(on, str) else list(on)
    return batch.join(index.select(*cols), cols, "left_anti")


def test_params_sizing():
    m, k = _bloom_params(1000, 0.01)
    # canonical sizing: ~9.6 bits/key at 1% fpp, k ~ 7
    assert 9000 <= m <= 10240 and m % 64 == 0
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        _bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        _bloom_params(100, 1.5)


def test_matches_anti_join(spark):
    index = spark.range(0, 500).select(
        F.concat(F.lit("u"), (F.col("id") * 3).cast("string")).alias("url")
    )
    batch = spark.range(0, 300).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
    )
    got = bloom_dedup(batch, index, "url")
    want = _anti(batch, index, "url")
    assert _rows(got, ["rid", "url"]) == _rows(want, ["rid", "url"])
    # sanity: some keys overlap (multiples of 3 < 300), some don't
    assert 0 < got.count() < 300


def test_null_keys_and_batch_duplicates(spark):
    index = spark.createDataFrame(
        [Row(url="a"), Row(url=None)], "url string"
    )
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, None), (5, None)],
        "rid int, url string",
    )
    got = bloom_dedup(batch, index, "url")
    want = _anti(batch, index, "url")
    # anti-join semantics: NULL never matches NULL -> rows 4,5 kept;
    # duplicate batch keys kept per-row, not collapsed
    assert _rows(got, ["rid", "url"]) == _rows(want, ["rid", "url"])
    assert got.count() == 4


def test_composite_key(spark):
    index = spark.createDataFrame(
        [(d, p) for d in range(10) for p in range(5)], "dom int, path int"
    )
    batch = spark.createDataFrame(
        [(i, i % 12, i % 7) for i in range(60)],
        "rid int, dom int, path int",
    )
    got = bloom_dedup(batch, index, ["dom", "path"])
    want = batch.join(index, ["dom", "path"], "left_anti")
    assert _rows(got, ["rid", "dom", "path"]) == _rows(
        want, ["rid", "dom", "path"]
    )


def test_empty_index_keeps_everything(spark):
    index = spark.createDataFrame([], "url string")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "rid int, url string")
    assert bloom_dedup(batch, index, "url").count() == 2


def test_precomputed_words_reused(spark):
    index = spark.range(0, 200).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
    )
    words = bloom_words(index, "k", expected_items=200, fpp=0.01)
    batch = spark.range(150, 260).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
    )
    got = bloom_dedup(batch, index, "k", words=words)
    want = _anti(batch, index, "k")
    assert _rows(got, ["k"]) == _rows(want, ["k"])
    # persisted-words path must carry the sizing columns
    assert {"__bloom_m", "__bloom_k"} <= set(words.columns)


def test_join_path_probe_is_broadcast(spark):
    # bitmap_max_mb=0 forces the distributed word-table strategy
    index = spark.range(0, 2000).select(F.col("id").alias("k"))
    batch = spark.range(1000, 3000).select(F.col("id").alias("k"))
    out = bloom_dedup(batch, index, "k", bitmap_max_mb=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the word-table probe must be a broadcast hash join, not a shuffle
    assert "BroadcastHashJoin" in plan
    assert out.count() == 1000


def test_bitmap_and_join_paths_agree(spark):
    index = spark.range(0, 1500).select(
        F.concat(F.lit("x"), (F.col("id") * 2).cast("string")).alias("k")
    )
    batch = spark.range(0, 1000).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("k"),
    )
    bitmap = bloom_dedup(batch, index, "k")  # default: bitmap broadcast
    joined = bloom_dedup(batch, index, "k", bitmap_max_mb=0)
    want = _anti(batch, index, "k")
    assert (
        _rows(bitmap, ["rid", "k"])
        == _rows(joined, ["rid", "k"])
        == _rows(want, ["rid", "k"])
    )


def test_bitmap_path_bloom_phase_is_map_only(spark):
    # the fresh branch must contain no shuffle before the union: filter
    # on the membership UDF only (the verification join is the single
    # exchange in the whole plan's maybe branch)
    index = spark.range(0, 5000).select(F.col("id").alias("k"))
    batch = spark.range(0, 1000).select((F.col("id") + 10_000).alias("k"))
    out = bloom_dedup(batch, index, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no aggregate/distinct anywhere in the bitmap strategy
    assert "HashAggregate" not in plan
    assert out.count() == 1000


def test_pruning_actually_prunes(spark):
    # a clean batch (no overlap): the verification join's input should
    # be ~fpp * |batch| keys, not the whole batch — measure via the
    # filter's own positives
    index = spark.range(0, 5000).select(
        F.concat(F.lit("idx"), F.col("id").cast("string")).alias("k")
    )
    words = bloom_words(index, "k", expected_items=5000, fpp=0.01)
    batch = spark.range(0, 2000).select(
        F.concat(F.lit("new"), F.col("id").cast("string")).alias("k")
    )
    got = bloom_dedup(batch, index, "k", words=words)
    assert got.count() == 2000  # nothing lost to false positives
    # independent positive count: with fpp=1%, 2000 clean keys should
    # yield far fewer than 5% positives
    from pandance_spark.operators.bloom import _positions, _word_mask

    params = words.select("__bloom_m", "__bloom_k").first()
    m, k = params["__bloom_m"], params["__bloom_k"]
    probes = batch.select(
        "k", F.explode(_positions([F.col("k")], m, k, 42)).alias("__bloom_pos")
    )
    word, mask = _word_mask(F.col("__bloom_pos"))
    hits = (
        probes.select("k", word.alias("__bloom_w"), mask.alias("__bloom_mask"))
        .join(words.select("__bloom_w", "__bloom_bits"), "__bloom_w", "left")
        .select(
            "k",
            (
                F.coalesce(F.col("__bloom_bits"), F.lit(0)).bitwiseAND(
                    F.col("__bloom_mask")
                )
                != 0
            ).alias("h"),
        )
        .groupBy("k")
        .agg(F.min("h").alias("all_hit"))
        .filter("all_hit")
        .count()
    )
    assert hits < 100  # < 5% of 2000 at nominal 1% fpp
