"""Continuous-aggregate (hypertable-style) rollup maintenance.

The TimescaleDB/Materialize pattern for time-series at scale: keep a
small per-(time bucket, key) aggregate table and maintain it
INCREMENTALLY as batches arrive — never rescan history.  The trick is
storing MERGEABLE PARTIALS (count, sum, min, max) instead of finished
aggregates (avg), so

    rollup(old data) ⊕ rollup(new batch) == rollup(all data)

holds exactly, batch by batch, in any order (the partial algebra is
commutative and associative).  Finished metrics (avg) are derived at
read time by ``finalize_rollup``.

Spark-first shape
-----------------
``build_rollup`` is one map-side-combined groupBy over the batch —
shuffle carries one partial row per (bucket, keys) per input
partition, never raw events.  ``merge_rollup`` is union + the same
groupBy over two already-tiny aggregate tables.  At 100 TB: store the
rollup PARTITIONED BY a coarse bucket prefix (day) and merge only the
partitions the batch touches — the batch's min/max bucket prunes the
existing side's scan (partition pruning does the rest); the merge
never touches untouched history.

Determinism / oracle: counts and min/max are exact; sums of doubles
are order-sensitive in the last ulp, so the driver oracle compares at
the checker's 9-dp rounding (the same tolerance class every float agg
in the suite uses).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "time_bucket",
    "build_rollup",
    "merge_rollup",
    "finalize_rollup",
]


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Floor a timestamp to a ``width_seconds`` bucket (TimescaleDB's
    ``time_bucket``): whole-second epochs divided and re-multiplied —
    pure integer arithmetic, identical in any engine."""
    if width_seconds < 1:
        raise ValueError("width_seconds must be >= 1")
    w = F.lit(int(width_seconds))
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / w).cast("long") * w
    )


def _check(keys, value_col):
    keys = [keys] if isinstance(keys, str) else list(keys)
    # __bucket/__last_bid are injected later by stream_rollup_sink's
    # partition hash and replay stamp — a key by either name would be
    # silently clobbered by withColumn
    reserved = {"bucket", "cnt", "v_sum", "v_min", "v_max", "__bucket", "__last_bid"}
    bad = reserved.intersection(keys + [value_col])
    if bad:
        raise ValueError(f"column names collide with rollup schema: {sorted(bad)}")
    return keys


def build_rollup(
    df: DataFrame,
    time_col: str,
    width_seconds: int,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Mergeable partial rollup of a batch:
    ``(bucket, *keys, cnt, v_sum, v_min, v_max)``.

    One map-side-combined groupBy.  ``cnt`` counts NON-NULL values
    (the SQL aggregate convention — a NULL value carries no
    information for any stored metric, and counting it would corrupt
    the derived avg); groups containing only NULL values are dropped
    entirely, keeping the partial algebra closed under merge.
    """
    keys = _check(keys, value_col)
    v = F.col(value_col)
    return (
        df.select(
            time_bucket(F.col(time_col), width_seconds).alias("bucket"),
            *[F.col(k) for k in keys],
            v.alias("__v"),
        )
        .groupBy("bucket", *keys)
        .agg(
            F.count("__v").alias("cnt"),
            F.sum("__v").alias("v_sum"),
            F.min("__v").alias("v_min"),
            F.max("__v").alias("v_max"),
        )
        .filter(F.col("cnt") > 0)
    )


def merge_rollup(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Combine two partial rollups with the same schema — the
    incremental maintenance step.  Union + one groupBy over
    aggregate-sized tables; buckets untouched by the delta pass
    through with one partial row (store the rollup partitioned by a
    bucket prefix and this groupBy prunes to touched partitions)."""
    group_cols = [c for c in existing.columns if c not in ("cnt", "v_sum", "v_min", "v_max")]
    if set(existing.columns) != set(delta.columns):
        raise ValueError(
            f"rollup schemas differ: {sorted(existing.columns)} vs "
            f"{sorted(delta.columns)}"
        )
    return (
        existing.unionByName(delta)
        .groupBy(*group_cols)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("v_sum").alias("v_sum"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )


def finalize_rollup(rollup: DataFrame, round_avg: int = 9) -> DataFrame:
    """Finished metrics from the partials: adds ``v_avg`` (rounded for
    cross-engine comparison; sums of doubles carry last-ulp order
    noise).  The partials stay in place — finalize is a projection,
    so the table remains mergeable."""
    return rollup.withColumn(
        "v_avg", F.round(F.col("v_sum") / F.col("cnt"), round_avg)
    )
