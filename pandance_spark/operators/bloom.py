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


def _positions(cols: Sequence[Column], m: int, k: int, seed: int) -> Column:
    """Array of the key's k bit positions, all JVM-side expressions."""
    return F.array(
        *[
            F.pmod(F.xxhash64(*cols, F.lit(seed + i)), F.lit(m))
            for i in range(k)
        ]
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


def bloom_dedup(
    batch: DataFrame,
    index: DataFrame,
    on: Union[str, Sequence[str]],
    fpp: float = 0.01,
    expected_items: Optional[int] = None,
    seed: int = 42,
    words: Optional[DataFrame] = None,
) -> DataFrame:
    """EXACT anti-join of ``batch`` against ``index``, Bloom-pruned.

    Returns the batch rows whose key does not appear in the index —
    identical semantics to ``batch.join(index, on, "left_anti")``
    (NULL keys never match, so NULL-keyed rows are always kept), but
    the index-side join input is reduced to the Bloom positives first.

    Three stages::

        words    = bloom_words(index)            # once; persistable
        possible = keys(batch) whose k bits all hit      # broadcast join
        result   = batch ∖ possible                       # definitely new
                 ∪ (batch ⋉ possible) ∖ index             # exact verify

    Shuffle inventory: ONE distinct over the batch's keys (batch-
    proportional — the price of any dedup), the broadcast probe join
    (no shuffle: the word table is m/64 rows), and the verification
    anti-join whose batch side is only the positives.  The index is
    scanned once for the build (skip it by passing a persisted
    ``words=``) and once for verification; store the index bucketed by
    key (``sources.save_bucketed``, as ``build_minhash_index`` does)
    and the verification join moves no index data either.

    The no-false-negative property is what makes the split sound: a
    key the filter rejects is PROVABLY absent, so only positives need
    the authoritative check, and ``fpp`` controls exactly how much
    spurious verification work a clean batch pays.
    """
    cols = [on] if isinstance(on, str) else list(on)
    if words is None:
        # params are known BEFORE the build, so the word aggregation
        # runs exactly once (inside the probe join's build side) —
        # no eager .first() re-running the index scan
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
