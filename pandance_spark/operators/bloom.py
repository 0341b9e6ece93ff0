"""Bloom-filter-accelerated incremental deduplication.

The continuous-ingestion problem the MinHash index (``dedup.py
build_minhash_index``) solves for NEAR-duplicates, solved here for
EXACT keys (URLs, content hashes, doc ids): every new crawl batch must
be checked against a multi-billion-row seen-set, and an anti-join that
shuffles the batch against the full index per batch is unaffordable at
100 TB.  A Bloom filter built once over the index keys answers
"definitely new" for the overwhelming majority of a typical batch with
a BROADCAST join against a tiny bitmap table — only the filter's
positives (true duplicates + ``fpp`` false positives) ever reach the
exact verification join, so the result is EXACT while the expensive
join's input shrinks from |batch| to ~|dupes| + fpp*|batch|.

Design — the bitmap lives in the PLAN, not on the driver:

- k hash positions per key are computed JVM-side (``xxhash64`` with k
  seeds, whole-stage codegen), never in Python.
- The filter is materialized as a DataFrame of 64-bit words
  ``(__bloom_w, __bloom_bits)`` — one aggregate over the index with
  map-side partial ``bit_or`` combine, output bounded by m/64 rows
  regardless of index row count.  For 10M expected keys at 1% fpp
  that is ~1.2 MB: an ideal broadcast-hash-join build side.
- Membership is a broadcast equi-join of the batch's exploded probe
  positions against the word table plus a ``min(hit)`` aggregate —
  zero Python, zero driver collect, no literal-array plan bloat.
- The word table is an ordinary DataFrame: persist it with
  ``sources.save_table`` and later batches skip the index scan
  entirely (pass it back via ``words=``).

Reference parity note: the reference engine has no incremental-dedup
surface (its dedup is in-memory pandas, reference ``pandance/
pandance.py`` merge paths); this operator is part of the training-data
pipeline extension surface, same family as ``build_minhash_index``
(dedup.py:966).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_words", "bloom_dedup"]

# caps keep a mis-sized build from materializing a pathological filter:
# 2^33 bits = 1 GiB of words — far past broadcast-able, the caller
# should shard (blocked Bloom) or raise fpp before raising this.
_MAX_BITS = 1 << 33
_MAX_HASHES = 16


def _bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m bits and k hashes for n keys at fpp."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    ln2 = math.log(2.0)
    m = int(math.ceil(-expected_items * math.log(fpp) / (ln2 * ln2)))
    # round up to a whole number of 64-bit words
    m = ((max(m, 64) + 63) // 64) * 64
    if m > _MAX_BITS:
        raise ValueError(
            f"filter would need {m} bits (> {_MAX_BITS}); shard the key "
            "space into blocked filters or raise fpp"
        )
    k = max(1, min(_MAX_HASHES, round(m / expected_items * ln2)))
    return m, k


def _base_hashes(cols: Sequence[Column], seed: int) -> tuple[Column, Column]:
    """The two independent 64-bit hashes every position derives from."""
    return (
        F.xxhash64(*cols, F.lit(seed)),
        F.xxhash64(*cols, F.lit(seed + 1)),
    )


def _positions(cols: Sequence[Column], m: int, k: int, seed: int) -> Column:
    """Array of the key's k bit positions, all JVM-side expressions.

    Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2 mod m,
    "Less Hashing, Same Performance", ESA 2006): k positions from TWO
    xxhash64 evaluations.  Beyond saving hash work, it means a Python
    membership test needs only (h1, h2) per row — 16 bytes over Arrow
    instead of 8k.  Both hashes are reduced mod m BEFORE combining, so
    every intermediate stays below k*m < 2^38: no long overflow (ANSI
    mode would throw) and no wrap-semantics coupling between engines —
    plain non-negative integer arithmetic both sides."""
    h1, h2 = _base_hashes(cols, seed)
    r1, r2 = F.pmod(h1, F.lit(m)), F.pmod(h2, F.lit(m))
    return F.array(
        *[F.pmod(r1 + F.lit(i) * r2, F.lit(m)) for i in range(k)]
    )


def _word_mask(pos: Column) -> tuple[Column, Column]:
    """(word index, single-bit mask) for a bit position."""
    word = (pos / 64).cast("long")
    # shiftleft's shift amount must be an expression to vary per row;
    # the SQL form accepts a column where the Python wrapper wants int
    mask = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__bloom_pos, 64) AS INT))"
    )
    return word, mask


def bloom_words(
    index: DataFrame,
    on: Union[str, Sequence[str]],
    expected_items: Optional[int] = None,
    fpp: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """Build the Bloom word table over an index's key column(s).

    Returns ``(__bloom_w, __bloom_bits, __bloom_m, __bloom_k)`` — the
    nonzero 64-bit words of the filter, each row also carrying the
    sizing parameters so :func:`bloom_dedup` can re-derive the probe
    scheme from a persisted table without a separate meta row.

    One pass over the index: explode k positions per key (k <= 16),
    hash-aggregate ``bit_or`` per word.  Partial aggregation combines
    map-side, so the shuffle carries at most m/64 words per input
    partition — bounded by filter geometry, not by index rows.

    ``expected_items=None`` runs ``index.count()`` (one extra scan —
    row count over-approximates distinct keys, which only makes the
    filter more conservative).  At real scale pass the known
    cardinality instead.
    """
    cols = [on] if isinstance(on, str) else list(on)
    if expected_items is None:
        expected_items = index.count()
    m, k = _bloom_params(max(expected_items, 1), fpp)
    return _words_df(index, cols, m, k, seed)


def _words_df(
    index: DataFrame, cols: Sequence[str], m: int, k: int, seed: int
) -> DataFrame:
    key_cols = [F.col(c) for c in cols]
    exploded = index.select(
        F.explode(_positions(key_cols, m, k, seed)).alias("__bloom_pos")
    )
    word, mask = _word_mask(F.col("__bloom_pos"))
    return (
        exploded.select(word.alias("__bloom_w"), mask.alias("__bloom_mask"))
        .groupBy("__bloom_w")
        .agg(F.bit_or("__bloom_mask").alias("__bloom_bits"))
        .select(
            "__bloom_w",
            "__bloom_bits",
            F.lit(m).alias("__bloom_m"),
            F.lit(k).alias("__bloom_k"),
        )
    )


def _bitmap_array(words: DataFrame, m: int) -> "np.ndarray":
    """Driver-side uint64 bitmap from the word table.  Bounded by
    construction: m/8 bytes, gated by ``bitmap_max_mb`` at the call
    site before this ever runs.

    Collected via ``toArrow`` — unlike ``toPandas`` it batches over
    Arrow regardless of session conf (measured 20.6 s -> ~1 s for a
    3M-word table when ``spark.sql.execution.arrow.pyspark.enabled``
    is at its false default)."""
    sel = words.select("__bloom_w", "__bloom_bits")
    try:
        tbl = sel.toArrow()
        w = tbl["__bloom_w"].to_numpy()
        b = tbl["__bloom_bits"].to_numpy()
    except AttributeError:  # pre-4.0 PySpark
        pdf = sel.toPandas()
        w = pdf["__bloom_w"].to_numpy()
        b = pdf["__bloom_bits"].to_numpy()
    arr = np.zeros(m // 64, dtype=np.uint64)
    if len(w):
        arr[w] = b.astype(np.int64).view(np.uint64)
    return arr


def bloom_dedup(
    batch: DataFrame,
    index: DataFrame,
    on: Union[str, Sequence[str]],
    fpp: float = 0.01,
    expected_items: Optional[int] = None,
    seed: int = 42,
    words: Optional[DataFrame] = None,
    bitmap_max_mb: int = 64,
) -> DataFrame:
    """EXACT anti-join of ``batch`` against ``index``, Bloom-pruned.

    Returns the batch rows whose key does not appear in the index —
    identical semantics to ``batch.join(index, on, "left_anti")``
    (NULL keys never match, so NULL-keyed rows are always kept), but
    only the Bloom POSITIVES (true duplicates + ~``fpp`` of the clean
    batch) ever reach an index join.

    Two physical strategies, picked by filter size:

    - **Bitmap broadcast (default, filters <= ``bitmap_max_mb``)**:
      the word table collapses to an m-bit numpy bitmap on the driver
      (m/8 bytes — 1.2 MB per million indexed keys at 1% fpp, bounded
      by geometry, NOT by index rows), is broadcast once, and
      membership is a vectorized Arrow ``pandas_udf`` bit-test over
      JVM-computed ``xxhash64`` positions.  The bloom phase is then
      MAP-ONLY — the batch is never shuffled, grouped, or distinct'd;
      the only shuffle anywhere is the verification anti-join whose
      batch side is just the positives.  (The batch is scanned twice —
      fresh branch and maybe branch — both scan+filter passes.)
    - **Word-table join (filters beyond the cap)**: the bitmap stays
      distributed; batch keys explode their k probe positions against
      a broadcast word DataFrame and group back.  Costs one
      batch-keys distinct + one probe aggregation, but supports
      filters far past driver memory.

    At 100 TB: build ``words = bloom_words(index)`` ONCE, persist it
    (``sources.save_table``), and pass it via ``words=`` so every
    batch skips the index scan; store the index bucketed by key and the
    verification join moves no index data either.  The
    no-false-negative property is what makes the split sound: a key
    the filter rejects is PROVABLY absent, so only positives need the
    authoritative check.
    """
    cols = [on] if isinstance(on, str) else list(on)
    if words is None:
        # params are known BEFORE the build, so the word aggregation
        # runs exactly once — no eager .first() re-running the scan
        if expected_items is None:
            expected_items = index.count()
        m, k = _bloom_params(max(expected_items, 1), fpp)
        words = _words_df(index, cols, m, k, seed)
    else:
        params = words.select("__bloom_m", "__bloom_k").first()
        if params is None:
            # empty index -> empty filter -> nothing can match
            return batch
        m, k = params["__bloom_m"], params["__bloom_k"]

    key_cols = [F.col(c) for c in cols]
    if m // 8 <= bitmap_max_mb * (1 << 20):
        return _bitmap_dedup(batch, index, cols, key_cols, words, m, k, seed)
    return _join_dedup(batch, index, cols, key_cols, words, m, k, seed)


def _bitmap_dedup(batch, index, cols, key_cols, words, m, k, seed):
    spark = batch.sparkSession
    bc = spark.sparkContext.broadcast(_bitmap_array(words, m))

    def _member(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        bits = bc.value
        a = h1s.to_numpy(dtype=np.int64, copy=False)
        b = h2s.to_numpy(dtype=np.int64, copy=False)
        if len(a) == 0:
            return pd.Series([], dtype=bool)
        ok = np.ones(len(a), dtype=bool)
        mm = np.int64(m)
        # reduce mod m first — mirrors _positions exactly (overflow-
        # free on both engines; % agrees with pmod for positive m)
        a = a % mm
        b = b % mm
        for i in range(k):
            p = (a + np.int64(i) * b) % mm
            vals = bits[p // 64]
            masks = np.left_shift(np.uint64(1), (p % 64).astype(np.uint64))
            ok &= (vals & masks) != 0
        return pd.Series(ok)

    member = F.pandas_udf(_member, "boolean")
    h1, h2 = _base_hashes(key_cols, seed)
    probed = batch.withColumn("__bloom_hit", member(h1, h2))
    fresh = probed.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    maybe = probed.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    verified = maybe.join(index.select(*cols), cols, "left_anti")
    return fresh.unionByName(verified)


def _join_dedup(batch, index, cols, key_cols, words, m, k, seed):
    probe_keys = batch.select(*cols).distinct()
    probes = probe_keys.select(
        *cols, F.explode(_positions(key_cols, m, k, seed)).alias("__bloom_pos")
    )
    word, mask = _word_mask(F.col("__bloom_pos"))
    probes = probes.select(*cols, word.alias("__bloom_w"), mask.alias("__bloom_mask"))
    hits = probes.join(
        F.broadcast(words.select("__bloom_w", "__bloom_bits")),
        "__bloom_w",
        "left",
    ).select(
        *cols,
        (
            F.coalesce(F.col("__bloom_bits"), F.lit(0))
            .bitwiseAND(F.col("__bloom_mask"))
            != 0
        ).alias("__bloom_hit"),
    )
    possible = (
        hits.groupBy(*cols)
        .agg(F.min("__bloom_hit").alias("__bloom_all"))
        .filter(F.col("__bloom_all"))
        .select(*cols)
    )
    # definitely new: the filter's no-false-negative guarantee
    fresh = batch.join(possible, cols, "left_anti")
    # positives: exact check against the authoritative index
    maybe = batch.join(possible, cols, "left_semi")
    verified = maybe.join(index.select(*cols), cols, "left_anti")
    return fresh.unionByName(verified)
