"""Data-layout utilities: multi-column clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet row-group min/max statistics prune groups whose range cannot
match a predicate, but they only help on columns the data is actually
clustered by.  Sorting by ONE column makes its row-group ranges tight
and every other column's ranges full-width; Z-ORDER (Morton-curve)
clustering interleaves the bits of several columns' normalized values
so row-group ranges are moderately tight on ALL of them — the layout
behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, here as plain Column
arithmetic + a range-partitioned parquet write, no table format
required.

Engine extension beyond the reference (SURVEY.md §2.4); the scale
evidence (per-row-group range fractions with and without Z-order) is
measured in ``scripts/scale_probe_r06b.py`` / SCALING.md.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "zorder_by",
    "write_zordered",
    "plan_output_partitions",
    "write_sized",
    "compact_files",
]

_INTEGRAL = {"byte", "short", "int", "integer", "bigint", "long"}


def zorder_key(
    cols: Sequence[Column],
    mins: Sequence[int],
    maxs: Sequence[int],
    bits: int = 16,
) -> Column:
    """Morton/Z-order key: normalize each column to ``[0, 2**bits)``
    over its ``[min, max]`` range, then interleave the bits
    (column j contributes bit ``i`` of its rank at output position
    ``i * n_cols + j``).  Pure integer Column arithmetic — the
    scaling is ``((v - min) * (2**bits - 1)) // (max - min)`` in
    int64, so the key is exactly reproducible in any engine (the
    driver oracle recomputes it bit-for-bit in DuckDB).

    ``mins``/``maxs`` are plain Python ints (collect them once with
    an ``agg`` — metadata-scale); values outside the range clamp to
    the ends, so a stale range degrades pruning, never correctness.
    A NULL in ANY clustered column makes the whole key NULL (an
    engine-independent definition — the DuckDB replay computes the
    same NULL); ``write_zordered`` sorts NULL keys first, so NULL
    rows cluster together at the front of the curve.
    ``bits * len(cols)`` must stay <= 63.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if len(mins) != n or len(maxs) != n:
        raise ValueError("mins/maxs must match cols")
    if bits < 1 or bits * n > 63:
        raise ValueError("bits * n_cols must be in [1, 63]")
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    # F.least/F.greatest SKIP nulls, which would silently clamp a NULL
    # value to the top rank — propagate NULL through the whole key
    # instead (review fix; pinned by tests)
    any_null = F.lit(False)
    for c in cols:
        any_null = any_null | c.isNull()
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        lo = int(lo)
        span = int(hi) - lo
        if span < 0:
            raise ValueError("max < min")
        # floor(double division) must equal exact integer division:
        # products stay below 2^53 where doubles are exact integers
        if span * top >= (1 << 53):
            raise ValueError(
                "column span too wide for exact scaling at this bit "
                "width — reduce bits or pre-bucket the column"
            )
        v = c.cast("long") - F.lit(lo)
        # clamp: out-of-range values (stale min/max) pin to the ends
        v = F.greatest(F.lit(0).cast("long"), F.least(v, F.lit(span)))
        # integer floor division: (v * top) div span — exact int64,
        # reproducible in any engine
        rank = (
            (v * F.lit(top)) / F.lit(span)
            if span > 0
            else F.lit(0)
        )
        rank = F.floor(rank).cast("long") if span > 0 else F.lit(0).cast("long")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(rank, i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return F.when(~any_null, key)


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_col: str = "__zorder",
) -> DataFrame:
    """Append the Z-order key for ``cols``: one tiny min/max aggregate
    (a single 1-row collect, metadata-scale — same contract as the
    band joins' 2-row bounds collect) feeds :func:`zorder_key`.
    Integral columns only — floats/decimals need an explicit
    fixed-point cast first so the key stays engine-exact.
    """
    types = dict(df.dtypes)
    for c in cols:
        t = types[c]
        if t not in _INTEGRAL:
            raise ValueError(
                f"zorder_by needs integral columns; {c!r} is {t} — "
                "cast to a fixed-point long first"
            )
    if key_col in df.columns:
        raise ValueError(
            f"column {key_col!r} already exists — pass a different "
            "key_col instead of silently overwriting it"
        )
    row = df.agg(
        *[F.min(c).alias(f"__lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"__hi{i}") for i, c in enumerate(cols)],
    ).first()
    # empty input / all-NULL column -> NULL bounds: degrade to a
    # zero-span column (rank 0) instead of crashing — an empty write
    # must still write an empty dataset, and all-NULL rows get NULL
    # keys via zorder_key's NULL propagation anyway (review fix)
    mins = [row[f"__lo{i}"] if row[f"__lo{i}"] is not None else 0
            for i in range(len(cols))]
    maxs = [row[f"__hi{i}"] if row[f"__hi{i}"] is not None else 0
            for i in range(len(cols))]
    return df.withColumn(
        key_col, zorder_key([F.col(c) for c in cols], mins, maxs, bits)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: Optional[int] = None,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    ``repartitionByRange`` on the key (contiguous curve segments per
    file — the shuffle that buys the layout) + ``sortWithinPartitions``
    so row groups inside each file stay tight (NULL keys — rows with
    a NULL in any clustered column — sort first), key column dropped
    on write.  After this, a selective predicate on ANY of ``cols``
    prunes most row groups via parquet min/max stats — measured in
    SCALING.md.
    """
    keyed = zorder_by(df, cols, bits)
    parts = (
        keyed.repartitionByRange(n_files, "__zorder")
        if n_files
        else keyed.repartitionByRange("__zorder")
    )
    (
        parts.sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def plan_output_partitions(
    df: DataFrame,
    target_bytes: int = 128 << 20,
    min_partitions: int = 1,
) -> int:
    """Number of output partitions that lands files near
    ``target_bytes``, from Catalyst's optimized-plan size estimate
    (``stats().sizeInBytes`` — no execution, no sampling job).

    The estimate is an IN-MEMORY width; callers targeting on-disk
    parquet sizes should inflate ``target_bytes`` by their expected
    compression ratio (see :func:`write_sized`).  On scan-rooted
    frames the estimate is file-size-accurate; after joins it can be
    a conservative product — checkpoint first or pass an explicit
    count when planning post-join writes.
    """
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    if min_partitions < 1:
        raise ValueError("min_partitions must be >= 1")
    import math

    from pandance_spark._kernel import plan_size_bytes

    size = plan_size_bytes(df)
    if size is None:
        # no statistics (e.g. a pure in-memory relation on an exotic
        # plan): fall back to the floor rather than crash a write job
        return min_partitions
    return max(min_partitions, math.ceil(size / target_bytes))


def write_sized(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 << 20,
    compression_ratio: float = 3.0,
    mode: str = "overwrite",
) -> int:
    """Write parquet in files near ``target_file_bytes`` on disk — the
    small-files fix: a 100 TB table written from 100k over-parallel
    tasks yields millions of KB-scale files whose open/footer overhead
    then dominates every scan; a compaction pass targeting ~128 MB
    restores scan efficiency (the number every lakehouse OPTIMIZE
    defaults to).  Partition count = Catalyst size estimate /
    (target × assumed parquet ``compression_ratio``); returns that
    PLANNED partition count (empty partitions or committer behavior
    can yield fewer actual files).

    The repartition is a round-robin shuffle — one pass over the data,
    the floor any compaction pays.  For pruning-friendly layouts
    compose with :func:`write_zordered` instead (range partitioning
    buys clustering; this buys file sizing only).
    """
    n = plan_output_partitions(
        df, int(target_file_bytes * compression_ratio)
    )
    df.repartition(n).write.mode(mode).parquet(path)
    return n


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
    compression_ratio: float = 3.0,
) -> int:
    """Read a (possibly fragmented) parquet directory and rewrite it
    size-targeted — the standalone compaction job.  Reading first
    makes the Catalyst estimate scan-rooted, i.e. as accurate as the
    source footers.  Returns the PLANNED output partition count —
    empty partitions or committer behavior can yield fewer actual
    files; count the directory if an exact file tally matters."""
    return write_sized(
        spark.read.parquet(src_path),
        dst_path,
        target_file_bytes,
        compression_ratio,
    )
