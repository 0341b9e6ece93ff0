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
    "hist_bin",
    "build_rollup_hist",
    "merge_rollup_hist",
    "quantile_from_hist",
    "build_rollup_distinct",
    "merge_rollup_distinct",
    "finalize_rollup_distinct",
    "build_rollup_bottomk",
    "merge_rollup_bottomk",
    "finalize_rollup_bottomk",
    "build_rollup_qsketch",
    "merge_rollup_qsketch",
    "finalize_rollup_qsketch",
    "bottomk_set_stats",
    "build_cms",
    "merge_cms",
    "cms_lookup",
    "fill_gaps",
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


def _check(keys, value_col, extra=()):
    keys = [keys] if isinstance(keys, str) else list(keys)
    # __bucket/__last_bid are injected later by stream_rollup_sink's
    # partition hash and replay stamp — a key by either name would be
    # silently clobbered by withColumn; hist/sketch are the metric
    # columns of the histogram and HLL rollup variants.  ``extra``
    # adds variant-specific names (the bottom-k family reserves short
    # common names like 'v'/'k', which must not poison the others)
    reserved = {
        "bucket", "cnt", "v_sum", "v_min", "v_max",
        "hist", "sketch", "__bucket", "__last_bid",
    } | set(extra)
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


def _check_bounds(bounds) -> list:
    bounds = [float(b) for b in bounds]
    if len(bounds) < 1:
        raise ValueError("need at least one bin boundary")
    if any(b2 <= b1 for b1, b2 in zip(bounds, bounds[1:])):
        raise ValueError("bounds must be strictly increasing")
    return bounds


def hist_bin(value: Column, bounds: Sequence[float]) -> Column:
    """Bin index of ``value`` against fixed ascending ``bounds``:
    ``0`` for ``value <= bounds[0]``, ``i`` for ``bounds[i-1] < value
    <= bounds[i]``, ``len(bounds)`` above the last bound — i.e. the
    number of bounds strictly below the value.  A pure Column
    expression over an array literal (whole-stage codegen; no UDF),
    and closed-form replayable in any engine with list functions.

    NaN lands in the TOP bin ``len(bounds)`` (Spark orders NaN greater
    than every double, so ``NaN > b`` holds for all bounds) — callers
    binning raw data should filter NaN first, as
    :func:`build_rollup_hist` does; NULL yields bin 0 (comparisons
    with NULL are false under ``F.filter``).
    """
    bounds = _check_bounds(bounds)
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(arr, lambda b: value.cast("double") > b))


def build_rollup_hist(
    df: DataFrame,
    time_col: str,
    width_seconds: int,
    keys: Sequence[str],
    value_col: str,
    bounds: Sequence[float],
) -> DataFrame:
    """Mergeable HISTOGRAM partials — the TimescaleDB
    ``percentile_agg`` / ``uddsketch`` pattern with a fixed,
    caller-chosen bin grid: per (bucket, keys) a ``hist`` array of
    per-bin counts (``len(bounds)+1`` bins from :func:`hist_bin`).
    Integer counts are exactly commutative/associative, so

        merge_rollup_hist(h(a), h(b)) == build_rollup_hist(a ∪ b)

    holds BIT-FOR-BIT (unlike float sums), and approximate quantiles
    with error bounded by the grid come from :func:`quantile_from_hist`
    at read time — continuous p99 dashboards over event streams
    without ever rescanning history.

    One map-side-combined groupBy (each bin is an independent
    conditional-count aggregate, so partials combine before the
    shuffle); shuffle carries ``len(bounds)+1`` longs per (bucket,
    keys) per input partition, never raw events.  NULL/NaN values
    carry no information and are excluded (same convention as
    ``build_rollup``); all-NULL groups are dropped to keep the algebra
    closed under merge.
    """
    keys = _check(keys, value_col)
    bounds = _check_bounds(bounds)
    nbins = len(bounds) + 1
    v = F.col("__v")
    ok = v.isNotNull() & ~F.isnan(v.cast("double"))
    idx = hist_bin(v, bounds)
    return (
        df.select(
            time_bucket(F.col(time_col), width_seconds).alias("bucket"),
            *[F.col(k) for k in keys],
            F.col(value_col).alias("__v"),
        )
        .filter(ok)
        .withColumn("__bin", idx)
        .groupBy("bucket", *keys)
        .agg(
            *[
                F.sum((F.col("__bin") == i).cast("long")).alias(f"__h{i}")
                for i in range(nbins)
            ]
        )
        .select(
            "bucket",
            *keys,
            F.array(*[F.col(f"__h{i}") for i in range(nbins)]).alias("hist"),
        )
    )


def merge_rollup_hist(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental maintenance for histogram partials: union + ONE
    groupBy over aggregate-sized tables; each group's few partial rows
    (typically 2) are collected and folded element-wise with
    ``zip_with`` addition — a single Exchange, no explode, and the
    per-group list is bounded by partial rows per group, never event
    volume.  Exact: integer addition — merge equals from-scratch
    bit-for-bit."""
    group_cols = [c for c in existing.columns if c != "hist"]
    if set(existing.columns) != set(delta.columns):
        raise ValueError(
            f"rollup schemas differ: {sorted(existing.columns)} vs "
            f"{sorted(delta.columns)}"
        )
    both = existing.unionByName(delta)
    zeros = F.transform(
        F.element_at(F.col("__hs"), 1), lambda _: F.lit(0).cast("long")
    )
    summed = F.aggregate(
        F.col("__hs"),
        zeros,
        lambda acc, h: F.zip_with(acc, h, lambda a, b: a + b),
    )
    # bin grids must agree: zip_with NULL-pads a shorter array, which
    # would corrupt counts silently — fail the job instead.  The
    # assert is folded INTO the output expression (a dropped guard
    # column would be pruned away by Catalyst and never evaluate);
    # assert_true yields NULL on success, so the when() passes summed
    # through.  Runs over aggregate-sized rows — negligible cost.
    same_len = F.forall(
        F.col("__hs"),
        lambda h: F.size(h) == F.size(F.element_at(F.col("__hs"), 1)),
    )
    guarded = F.when(
        F.assert_true(
            same_len,
            F.lit("merge_rollup_hist: inputs were built with different "
                  "bin grids (hist arrays differ in length)"),
        ).isNull(),
        summed,
    )
    return (
        both.groupBy(*group_cols)
        .agg(F.collect_list("hist").alias("__hs"))
        .select(*group_cols, guarded.alias("hist"))
    )


def quantile_from_hist(
    rollup: DataFrame, q: float, bounds: Sequence[float]
) -> DataFrame:
    """Approximate quantile at read time from histogram partials:
    adds ``q_bin`` (index of the bin holding the ceil(q·n)-th value)
    and ``q_upper`` (that bin's upper bound; the true quantile is
    ≤ ``q_upper`` and > the previous bound).  Values above the last
    bound report ``q_upper = NULL`` (unbounded top bin) — choose the
    grid to cover the operating range.  Pure integer/array arithmetic
    — no float interpolation, so any engine replays it exactly.
    The partials stay in place; this is a projection."""
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    bounds = _check_bounds(bounds)
    total = F.aggregate(F.col("hist"), F.lit(0).cast("long"), lambda a, c: a + c)
    rank = F.ceil(F.lit(q) * total).cast("long")
    # running cumulative counts, then: q_bin = #bins whose cum < rank
    cum = F.transform(
        F.col("hist"),
        lambda c, i: F.aggregate(
            F.slice(F.col("hist"), 1, i + 1),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    qbin = F.size(F.filter(cum, lambda c: c < rank))
    uppers = F.array(*[F.lit(b) for b in bounds])
    return (
        rollup.withColumn("q_bin", qbin)
        .withColumn(
            "q_upper",
            F.when(
                F.col("q_bin") < len(bounds),
                F.element_at(uppers, F.col("q_bin") + 1),
            ),
        )
    )


def build_rollup_distinct(
    df: DataFrame,
    time_col: str,
    width_seconds: int,
    keys: Sequence[str],
    id_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable DISTINCT-COUNT partials — "distinct users per hour",
    the one dashboard metric plain partials cannot carry (distinct is
    not sum-decomposable).  Stores an Apache DataSketches HLL sketch
    per (bucket, keys) via Spark's built-in ``hll_sketch_agg`` (JVM
    aggregate, map-side combined); unioning sketches loses no
    information relative to the union's register set, so

        merge_rollup_distinct(d(a), d(b)) ≈ build_rollup_distinct(a ∪ b)

    batch by batch, in any order — ≈, not ==: DataSketches promotes
    sketch modes (HLL_4 target vs the union's HLL_8 gadget) so the
    merged ESTIMATE can differ from the direct-built one by a fraction
    of the sketch's own error bound (measured ~1% at lg_k=12; the unit
    test pins both within the bound of each other and of the exact
    count).  Estimates come from :func:`finalize_rollup_distinct` at
    read time (~1.04/sqrt(2^lg_k) relative standard error).  The raw
    id column never leaves its scan — shuffle carries one
    ≤2^lg_k-register sketch per group per input partition.

    No cross-engine oracle exists for sketch bytes (estimates are
    DataSketches-specific), so driver verification is rows-only; the
    merge==from-scratch property is pinned exactly by unit test
    instead.
    """
    keys = _check(keys, id_col)
    if not 4 <= lg_k <= 21:
        raise ValueError("lg_k must be in [4, 21]")
    return (
        df.select(
            time_bucket(F.col(time_col), width_seconds).alias("bucket"),
            *[F.col(k) for k in keys],
            F.col(id_col).alias("__id"),
        )
        .filter(F.col("__id").isNotNull())
        .groupBy("bucket", *keys)
        .agg(F.hll_sketch_agg("__id", F.lit(lg_k)).alias("sketch"))
    )


def merge_rollup_distinct(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental maintenance for distinct partials: union + one
    groupBy over aggregate-sized tables, sketches combined with
    ``hll_union_agg`` (register-wise max; see the mode-promotion
    caveat on :func:`build_rollup_distinct`)."""
    group_cols = [c for c in existing.columns if c != "sketch"]
    if set(existing.columns) != set(delta.columns):
        raise ValueError(
            f"rollup schemas differ: {sorted(existing.columns)} vs "
            f"{sorted(delta.columns)}"
        )
    return (
        existing.unionByName(delta)
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch", F.lit(True)).alias("sketch"))
    )


def finalize_rollup_distinct(rollup: DataFrame) -> DataFrame:
    """Adds ``approx_distinct`` from the stored sketches — a
    projection; the partials stay mergeable."""
    return rollup.withColumn(
        "approx_distinct", F.hll_sketch_estimate("sketch").cast("long")
    )


def _kmv_hash(col: Column, portable: bool = True) -> Column:
    """60-bit non-negative hash for KMV order statistics.
    ``portable=True``: the first 15 hex chars of md5 over the value's
    canonical string — bit-identical in any engine with md5 (DuckDB:
    ``CAST('0x' || substr(md5(v), 1, 15) AS BIGINT)``); 60 bits fit a
    signed long with no overflow games.  ``portable=False``: xxhash64
    folded non-negative (faster, engine-specific)."""
    if not portable:
        return F.pmod(F.xxhash64(col), F.lit(1 << 60))
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def build_rollup_bottomk(
    df: DataFrame,
    time_col: str,
    width_seconds: int,
    keys: Sequence[str],
    id_col: str,
    k: int = 64,
    portable: bool = True,
) -> DataFrame:
    """Mergeable KMV BOTTOM-K partials — the third member of the
    sketch-partial family (sum algebra: :func:`build_rollup`;
    histogram: :func:`build_rollup_hist`; HLL: :func:`
    build_rollup_distinct`): per (bucket, keys) the k smallest
    ``(hash, value)`` pairs over the DISTINCT values of ``id_col``
    under a fixed 60-bit hash order.

    One sketch, two read-time products (:func:`finalize_rollup_bottomk`):

    - ``distinct_est`` — the KMV/bottom-k estimator (Bar-Yossef et al.
      2002): exact when the group holds < k distinct values (the
      sketch IS the value set), else ``(k-1) / u_k`` with ``u_k`` the
      k-th smallest normalized hash (~1/sqrt(k) RSE).
    - ``sample`` — the stored values are a uniform without-replacement
      sample of the group's distinct values (hash order is independent
      of the data), usable directly for "show me 5 example user_ids
      per anomalous bucket".

    Unlike HLL, the merge is EXACT and order/batch-shape independent:
    bottom-k of a union equals bottom-k of the unioned bottom-k's, so

        merge_rollup_bottomk(b(a), b(b)) == build_rollup_bottomk(a ∪ b)

    holds BIT-FOR-BIT (pinned by unit test), and with
    ``portable=True`` (md5) an external engine replays sketches,
    estimates and samples exactly — this family is fully
    oracle-checkable where HLL is rows-only.

    Plan shape: distinct on (bucket, keys, value) (map-side combined),
    then one row_number window per group capped at k — shuffle volume
    is distinct values for the build, k rows per group thereafter.
    """
    keys = _check(
        keys, id_col,
        extra=("bk", "v", "k", "__h", "__rn", "distinct_est", "sample"),
    )
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    base = (
        df.select(
            time_bucket(F.col(time_col), width_seconds).alias("bucket"),
            *[F.col(c) for c in keys],
            F.col(id_col).alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .distinct()
        .withColumn("__h", _kmv_hash(F.col("v"), portable))
    )
    w = Window.partitionBy("bucket", *keys).orderBy("__h", "v")
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("bucket", *keys)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__h").alias("h"), "v"))
            ).alias("bk")
        )
        # the sketch parameter rides in the partial so merge/finalize
        # can refuse a mismatched k instead of silently computing a
        # truncated-sketch "exact" count (r7 review)
        .withColumn("k", F.lit(int(k)))
    )


def _assert_k(df: DataFrame, k: int) -> DataFrame:
    """Fail the job if any partial row carries a different sketch k
    than the caller passed — a k=32-built sketch finalized at k=64
    would silently report distinct_est = 32 for an arbitrarily large
    group (every truncated group takes the exact-count branch)."""
    chk = F.assert_true(
        F.col("k") == F.lit(int(k)),
        F.concat(
            F.lit("bottom-k sketch built with k="),
            F.col("k").cast("string"),
            F.lit(f", operated on with k={int(k)}"),
        ),
    )
    # routed through a filter, not a dropped column — Catalyst prunes
    # an unused projection and the assert would never evaluate
    return df.filter(chk.isNull())


def merge_rollup_bottomk(
    existing: DataFrame, delta: DataFrame, k: int = 64
) -> DataFrame:
    """Incremental maintenance for bottom-k partials: explode both
    sides, distinct, re-rank, re-slice — aggregate-sized work (at most
    2k rows per group enter the window).  Exactly equals the
    from-scratch build over the combined input."""
    if set(existing.columns) != set(delta.columns):
        raise ValueError(
            f"rollup schemas differ: {sorted(existing.columns)} vs "
            f"{sorted(delta.columns)}"
        )
    from pyspark.sql import Window

    group_cols = [c for c in existing.columns if c != "bk"]
    exploded = (
        _assert_k(existing, k).unionByName(_assert_k(delta, k))
        .select(*group_cols, F.explode("bk").alias("e"))
        .select(*group_cols, F.col("e.h").alias("__h"), F.col("e.v").alias("v"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h", "v")
    return (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__h").alias("h"), "v"))
            ).alias("bk")
        )
    )


def finalize_rollup_bottomk(
    rollup: DataFrame, k: int = 64, sample_size: int = 5
) -> DataFrame:
    """Read-time products from bottom-k partials: ``distinct_est``
    (exact below k, KMV ``(k-1)/u_k`` above — one double division,
    replayable bit-for-bit) and ``sample`` (the ``sample_size``
    hash-smallest values).  A projection; partials stay mergeable.
    Fails fast if ``k`` differs from the build-time k stored in the
    partials."""
    rollup = _assert_k(rollup, k)
    n = F.size("bk")
    # u_k = (h_k + 1) / 2^60, h_k the k-th smallest 60-bit hash
    hk = F.element_at("bk", k)["h"]
    est = F.when(n < k, n.cast("long")).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(1 << 60))
            / (hk + F.lit(1)).cast("double")
        ).cast("long")
    )
    return rollup.withColumn("distinct_est", est).withColumn(
        "sample",
        F.transform(
            F.slice("bk", 1, sample_size), lambda e: e["v"]
        ),
    )


def build_rollup_qsketch(
    df: DataFrame,
    time_col: str,
    width_seconds: int,
    keys: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = 1024,
    portable: bool = True,
) -> DataFrame:
    """Mergeable QUANTILE sketch partials — quantiles WITHOUT a fixed
    bin grid (the gap :func:`quantile_from_hist` leaves: its bounds
    must be known up front).  Construction: the mergeable
    uniform-sample quantile summary of Agarwal et al., "Mergeable
    Summaries" (PODS 2012, §3): per (bucket, keys) keep the ``k``
    rows whose ``id_col`` hashes SMALLEST under a fixed 60-bit order,
    carrying their values.  Hash order is independent of the data, so
    the kept rows are a uniform without-replacement sample of the
    group's rows and the sample's empirical quantiles estimate the
    group's with rank error bounded by DKW:
    ``sup_q |rank_est(q) - q*n| <= n * sqrt(ln(2/delta) / (2k))``
    with probability 1-delta (k=1024: ~4.3% of n at 99.9%; exact
    whenever the group has <= k rows, since then the sketch IS the
    group).

    Deliberately NOT KLL/GK: their merges only preserve the error
    bound — two KLL sketches merge into a sketch whose contents
    depend on merge order, so ``merge == from-scratch`` can never be
    pinned bit-for-bit and no external engine can replay the result.
    This family's merge IS exact, order/batch-shape independent
    (bottom-k of a union == bottom-k of the unioned bottom-k's, the
    KMV algebra of :func:`build_rollup_bottomk`, here over row ids
    with multiplicity instead of distinct values):

        merge_rollup_qsketch(s(a), s(b)) == build_rollup_qsketch(a ∪ b)

    bit-for-bit (pinned by unit test), and ``portable=True`` (md5)
    lets DuckDB replay sketch contents AND quantile estimates exactly
    — a fully hash-green oracle where a KLL implementation could only
    ever offer a rows-only contract.  The price is sketch size:
    a uniform sample needs k = O(1/eps^2) where KLL needs
    O((1/eps)·log^2 log(1/delta)) — the right trade here, where the
    sketch must be cheap to VERIFY, not minimal to store.

    ``id_col`` must be unique per row (it is the sampling key); n
    (the true row count) rides in the partial, so finalize can flag
    exact groups and scale ranks.  Plan shape: one row_number window
    per group capped at k, then one groupBy — shuffle volume is the
    raw rows once for the build, k rows per group thereafter.
    """
    keys = _check(
        keys, value_col,
        extra=("qs", "n", "v", "k", "__h", "__rn", "m",
               "exact", "quantiles"),
    )
    if k < 2:
        raise ValueError("k must be >= 2")
    if id_col in ("qs", "n", "k"):
        raise ValueError(f"id_col {id_col!r} collides with sketch schema")
    from pyspark.sql import Window

    base = df.select(
        time_bucket(F.col(time_col), width_seconds).alias("bucket"),
        *[F.col(c) for c in keys],
        F.col(value_col).cast("double").alias("v"),
        _kmv_hash(F.col(id_col), portable).alias("__h"),
    ).filter(F.col("v").isNotNull())
    w = Window.partitionBy("bucket", *keys).orderBy("__h", "v")
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__n",
            F.count("*").over(
                Window.partitionBy("bucket", *keys)
            ),
        )
        .filter(F.col("__rn") <= k)
        .groupBy("bucket", *keys)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__h").alias("h"), "v"))
            ).alias("qs"),
            F.max("__n").alias("n"),
        )
        .withColumn("k", F.lit(int(k)))
    )


def merge_rollup_qsketch(
    existing: DataFrame, delta: DataFrame, k: int = 1024
) -> DataFrame:
    """Incremental maintenance for quantile-sketch partials: explode
    both sides, re-rank by the fixed (hash, value) order, re-slice,
    sum the true counts — at most 2k rows per group enter the window.
    Exactly equals the from-scratch build over the combined input
    (duplicate (h, v) pairs are KEPT — they are distinct sampled rows,
    unlike the distinct-value bottom-k).  The two inputs must cover
    DISJOINT row sets (the same contract every partial family here
    has).  Fails fast on a k mismatch."""
    if set(existing.columns) != set(delta.columns):
        raise ValueError(
            f"rollup schemas differ: {sorted(existing.columns)} vs "
            f"{sorted(delta.columns)}"
        )
    from pyspark.sql import Window

    group_cols = [c for c in existing.columns if c not in ("qs", "n")]
    # `both` feeds TWO consumers (the n re-sum and the explode/re-rank):
    # without a barrier each side's whole BUILD plan (corpus scan +
    # per-group window) evaluates twice (guide §2.4 — r11 before-plan of
    # rollup_qsketch showed 4 corpus scans for 2 builds).  The partials
    # are sketch-sized (<= k rows per group) by contract, so the lazy
    # checkpoint is bounded at any corpus scale.
    both = (
        _assert_k(existing, k)
        .unionByName(_assert_k(delta, k))
        .localCheckpoint(eager=False)
    )
    n_sum = both.groupBy(*group_cols).agg(F.sum("n").alias("n"))
    exploded = both.select(
        *group_cols, F.explode("qs").alias("e")
    ).select(
        *group_cols, F.col("e.h").alias("__h"), F.col("e.v").alias("v")
    )
    w = Window.partitionBy(*group_cols).orderBy("__h", "v")
    merged = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__h").alias("h"), "v"))
            ).alias("qs")
        )
    )
    out_cols = [c for c in existing.columns]
    return merged.join(n_sum, group_cols).select(*out_cols)


def finalize_rollup_qsketch(
    rollup: DataFrame,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    k: int = 1024,
    round_to: int = 9,
) -> DataFrame:
    """Read-time quantile estimates from sketch partials: for each
    requested probability ``p``, the sample's lower empirical
    quantile — the value at rank ``max(1, ceil(p * m))`` of the m
    sampled values sorted ascending (p=0 -> sample min, p=1 -> sample
    max).  Closed-form arithmetic only (one ceil per prob), so an
    external engine replays estimates bit-for-bit.  Adds ``m`` (sample
    size), ``exact`` (n <= k: the sketch holds the whole group, the
    estimate is the true quantile), and ``quantiles`` (array aligned
    with ``probs``, rounded to ``round_to`` dp).  A projection —
    partials stay mergeable.  Fails fast if ``k`` differs from the
    build-time k stored in the partials."""
    probs = [float(p) for p in probs]
    if not probs or any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError("probs must be non-empty, each in [0, 1]")
    rollup = _assert_k(rollup, k)
    vs = F.array_sort(F.transform("qs", lambda e: e["v"]))
    m = F.size("qs")
    ests = F.array(
        *[
            F.round(
                F.element_at(
                    vs,
                    F.greatest(
                        F.lit(1), F.ceil(F.lit(p) * m).cast("int")
                    ),
                ),
                round_to,
            )
            for p in probs
        ]
    )
    return (
        rollup.withColumn("m", m)
        .withColumn("exact", F.col("n") <= F.lit(int(k)))
        .withColumn("quantiles", ests)
    )


def bottomk_set_stats(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Distinct-set ALGEBRA from two bottom-k sketch tables — the
    KMV estimators of Beyer et al. (SIGMOD 2007) / Bar-Yossef et al.:
    given :func:`build_rollup_bottomk` partials over the same group
    keys and the same (k, hash) parameters, estimate per group

    - ``union_est``      |A ∪ B| — KMV estimate on the MERGED sketch
      (exact bottom-k of the union, the family's algebra);
    - ``jaccard_est``    |A ∩ B| / |A ∪ B| — the fraction of the
      union's k smallest hashes present in BOTH sketches (the
      classic MinHash/KMV coincidence estimator, here over the
      bottom-k coordinated sample — ~1/sqrt(k) RSE);
    - ``intersect_est``  jaccard_est * union_est.

    The question this answers at 100 TB: "how much do two corpus
    snapshots / sources / crawls overlap, per bucket?" — WITHOUT
    joining the raw corpora: both inputs are k-row-per-group
    sketches, so the whole computation is aggregate-sized.  Exact
    when both groups hold < k distinct values (the sketches ARE the
    sets).  With ``portable=True`` sketches every number replays in
    plain SQL (the driver oracle recomputes sketches AND estimates
    from raw rows).  A group present on only one side degrades
    gracefully: union = that side's estimate, jaccard = 0.
    """
    from pyspark.sql import Window

    for df, nm in ((a, "a"), (b, "b")):
        if "bk" not in df.columns or "k" not in df.columns:
            raise ValueError(
                f"input {nm!r} is not a bottom-k sketch table "
                "(expected 'bk' and 'k' columns)"
            )
    a = _assert_k(a, k)
    b = _assert_k(b, k)
    group_cols = [c for c in a.columns if c not in ("bk", "k")]
    if set(group_cols) != {
        c for c in b.columns if c not in ("bk", "k")
    }:
        raise ValueError(
            f"group columns differ: {sorted(group_cols)} vs "
            f"{sorted(c for c in b.columns if c not in ('bk', 'k'))}"
        )
    ea = a.select(
        *group_cols, F.explode("bk").alias("e")
    ).select(
        *group_cols,
        F.col("e.h").alias("__h"),
        F.col("e.v").alias("__v"),
        F.lit(1).alias("__in_a"),
        F.lit(0).alias("__in_b"),
    )
    eb = b.select(
        *group_cols, F.explode("bk").alias("e")
    ).select(
        *group_cols,
        F.col("e.h").alias("__h"),
        F.col("e.v").alias("__v"),
        F.lit(0).alias("__in_a"),
        F.lit(1).alias("__in_b"),
    )
    # value present in both sketches -> ONE row with both flags (the
    # hash is a function of the value, so (h, v) dedups exactly)
    both = (
        ea.unionByName(eb)
        .groupBy(*group_cols, "__h", "__v")
        .agg(
            F.max("__in_a").alias("__in_a"),
            F.max("__in_b").alias("__in_b"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy("__h", "__v")
    topk = both.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__m"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
        F.sum(
            (F.col("__in_a") * F.col("__in_b")).cast("long")
        ).alias("__shared"),
    )
    union_est = F.when(
        F.col("__m") < k, F.col("__m").cast("long")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(1 << 60))
            / (F.col("__hk") + F.lit(1)).cast("double")
        ).cast("long")
    )
    jacc = F.round(F.col("__shared") / F.col("__m"), 9)
    return agg.select(
        *group_cols,
        union_est.alias("union_est"),
        jacc.alias("jaccard_est"),
        F.round(
            (F.col("__shared") / F.col("__m")) * union_est, 0
        ).cast("long").alias("intersect_est"),
    )


def finalize_rollup(rollup: DataFrame, round_avg: int = 9) -> DataFrame:
    """Finished metrics from the partials: adds ``v_avg`` (rounded for
    cross-engine comparison; sums of doubles carry last-ulp order
    noise).  The partials stay in place — finalize is a projection,
    so the table remains mergeable."""
    return rollup.withColumn(
        "v_avg", F.round(F.col("v_sum") / F.col("cnt"), round_avg)
    )


def fill_gaps(
    df: DataFrame,
    time_col: str,
    width_seconds: int,
    keys: Sequence[str],
    value_col: str,
    locf: bool = True,
) -> DataFrame:
    """TimescaleDB's ``time_bucket_gapfill`` (+ ``locf``) for a sparse
    per-key series: emit EVERY ``width_seconds`` bucket between each
    key's first and last observation, carrying the last observed value
    forward across the gaps (``locf=False`` leaves gap rows NULL).
    Returns ``(bucket, *keys, value, is_filled)`` where ``value`` on an
    observed bucket is the bucket's LAST observation (latest
    ``time_col``; ties on time broken by largest value so the pick is
    deterministic under any partitioning).

    Plan shape: ONE groupBy on (bucket, keys) reduces observations to
    per-bucket last values; one per-key min/max aggregate sizes the
    grid; the grid itself is ``sequence``+``explode`` — generated,
    never shuffled — and the gap join is an equi-join on (bucket,
    keys) that AQE broadcasts when the observed side is small.  The
    LOCF window runs over the GRID (buckets × keys rows, bounded by
    horizon/width — never raw observations).

    At 100 TB of raw events the cost is the first groupBy (the same
    reduction ``build_rollup`` pays); everything after operates on
    grid-sized tables.  A key's grid length is its own observation
    span — a years-long key costs its own span, not the corpus's.
    """
    keys = _check(keys, value_col)
    # only KEY columns survive into the output schema alongside
    # value/is_filled (the value column is re-aliased internally, so a
    # value_col literally named "value" is fine)
    bad = {"value", "is_filled"}.intersection(keys)
    if bad:
        raise ValueError(
            f"column names collide with fill_gaps output: {sorted(bad)}"
        )
    if width_seconds < 1:
        raise ValueError("width_seconds must be >= 1")
    w = int(width_seconds)

    v = F.col(value_col)
    obs = (
        df.filter(v.isNotNull() & F.col(time_col).isNotNull())
        .select(
            time_bucket(F.col(time_col), w).alias("bucket"),
            *[F.col(k) for k in keys],
            F.col(time_col).alias("__t"),
            v.alias("__v"),
        )
        .groupBy("bucket", *keys)
        .agg(F.max(F.struct(F.col("__t"), F.col("__v"))).alias("__last"))
        .select("bucket", *keys, F.col("__last.__v").alias("__obs"))
    )
    span = obs.groupBy(*keys).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"interval {w} seconds")
            )
        ).alias("bucket"),
    )
    joined = grid.join(obs, ["bucket"] + keys, "left")
    out = joined.withColumn("is_filled", F.col("__obs").isNull())
    if locf:
        from pyspark.sql import Window

        lw = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn(
            "value", F.last("__obs", ignorenulls=True).over(lw)
        )
    else:
        out = out.withColumn("value", F.col("__obs"))
    return out.select("bucket", *keys, "value", "is_filled")


# --- Count-Min sketch (Cormode & Muthukrishnan 2005) ----------------------
# Fourth member of the mergeable-sketch-partial family (sums /
# histogram / HLL / KMV above): fixed d x w counter grid supporting
# point-frequency queries with one-sided error — estimates never
# undercount, and overshoot is bounded by e/w * N with probability
# 1 - e^-d.  The sketch a 100 TB pipeline keeps per shard to answer
# "how often did THIS url/user/token appear" without a per-key table:
# partials are plain (row, col, cnt) rows, merge is counter addition
# (exact, associative, order-independent), so shards build locally and
# the union reduces map-side.


def _cms_hash(col: Column, row: int, width: int, portable: bool = True) -> Column:
    """Bucket of ``col`` under hash-row ``row``: the module's portable
    60-bit md5 hash (:func:`_kmv_hash` — ONE place owns the
    cross-engine recipe) over ``'<row>:' || value``, reduced mod
    ``width`` (DuckDB replay: ``CAST('0x' || substr(md5(...), 1, 15)
    AS BIGINT) % width``); or seeded xxhash64 when portability doesn't
    matter."""
    if not portable:
        return F.pmod(F.xxhash64(F.lit(row), col), F.lit(int(width)))
    return F.pmod(
        _kmv_hash(F.concat(F.lit(f"{row}:"), col.cast("string"))),
        F.lit(int(width)),
    )


def _check_cms_shape(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")


def build_cms(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    portable: bool = True,
) -> DataFrame:
    """Count-Min sketch of ``df[value_col]`` frequencies as a
    ``(row, col, cnt)`` DataFrame (NULLs excluded; at most
    ``depth * width`` rows).

    Plan shape: each input row contributes ``depth`` (row, bucket)
    pairs via ONE inline posexplode over the per-row hash array, then
    a hash aggregate — map-side partial combine collapses every input
    partition to at most ``depth * width`` partial counters before the
    shuffle, so shuffle volume is sketch-sized, never data-sized.  The
    one-sided guarantee (est >= true; P[est > true + e/w * N] < e^-d)
    and exact mergeability are pinned by tests.
    """
    _check_cms_shape(depth, width)
    v = F.col(value_col)
    hashes = F.array(
        *[_cms_hash(v, r, width, portable) for r in range(depth)]
    )
    return (
        df.filter(v.isNotNull())
        .select(F.posexplode(hashes).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS partials built with the SAME (depth, width,
    portable) parameters: counter addition — exact and associative, so
    ``merge(build(x), build(y)) == build(x UNION ALL y)`` bit-for-bit
    (pinned by unit test).  Shapes are not re-validated here; mixing
    sketches of different geometry is a caller error."""
    return (
        a.select("row", "col", "cnt")
        .unionAll(b.select("row", "col", "cnt"))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    portable: bool = True,
) -> DataFrame:
    """Point-frequency estimates for ``items[value_col]``: each item
    probes its ``depth`` counters and takes the MIN (missing counter =
    0 — the value hashed to a cell nothing ever incremented).  Adds
    ``est_n`` (long) to the item rows.

    Spark-first: the probe is an equi-join on (row, col) against the
    sketch — at most ``depth * width`` rows, hinted broadcast, so the
    lookup is a map-side hash probe with zero shuffle of the item
    stream no matter how large it is.  Item ROWS are preserved
    one-to-one (duplicates stay duplicates — a per-row id carries
    them through the min-of-d regroup), and the sketch's column names
    are renamed internally so items may carry ``row``/``col``/``cnt``
    columns of their own."""
    _check_cms_shape(depth, width)
    if "est_n" in items.columns:
        raise ValueError("items already has an est_n column")
    v = F.col(value_col)
    hashes = F.array(
        *[_cms_hash(v, r, width, portable) for r in range(depth)]
    )
    probes = items.withColumn(
        "__cms_rid", F.monotonically_increasing_id()
    ).select("*", F.posexplode(hashes).alias("__cms_row", "__cms_col"))
    sk = sketch.select(
        F.col("row").alias("__sk_row"),
        F.col("col").alias("__sk_col"),
        F.col("cnt").alias("__sk_cnt"),
    )
    joined = probes.join(
        F.broadcast(sk),
        (F.col("__cms_row") == F.col("__sk_row"))
        & (F.col("__cms_col") == F.col("__sk_col")),
        "left",
    )
    others = list(items.columns)
    return (
        joined.groupBy("__cms_rid", *others)
        .agg(F.min(F.coalesce(F.col("__sk_cnt"), F.lit(0))).alias("est_n"))
        .drop("__cms_rid")
    )
