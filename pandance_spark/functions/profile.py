"""Table profiling: per-column health stats for pipeline monitoring.

Training-data pipelines gate ingestion on data health — a upstream
schema drift or a join gone wrong shows up first as a null-fraction or
cardinality jump.  ``profile_table`` produces the long-form stats
table that monitoring compares run-over-run.

Spark-first shape: ONE aggregation computes every column's null and
exact distinct counts in a single pass over the data — Catalyst plans
multiple DISTINCT aggregates with an Expand (each input row fans out
once per distinct-agg, partial-aggregated map-side before the
shuffle), so the scan happens once regardless of column count.  The
final unpivot to long form is a ``stack`` over the 1-row result.
Exact distincts are the oracle-comparable default; at 100 TB switch
``approx=True`` for HyperLogLog (``approx_count_distinct``) — the
Expand then carries sketches, not values.
"""

from __future__ import annotations

import math

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "drop_reason",
    "filter_funnel",
    "heavy_hitters",
    "outliers_mad",
    "profile_table",
    "psi_drift",
    "skew_report",
]


def profile_table(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    approx: bool = False,
) -> DataFrame:
    """Long-form column profile: one row per column with
    ``(col_name, n_rows, n_nulls, n_distinct)``.

    ``n_distinct`` excludes NULLs (the SQL ``count(DISTINCT c)``
    convention, identical in any engine).  ``approx=True`` swaps exact
    distinct counting for ``approx_count_distinct`` — the scale path;
    keep exact for oracle comparison and small tables.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct

    # backtick-quoted references so a column literally named "a.b" is
    # not misresolved as a nested-field path (df[c] and F.col both
    # parse dots)
    def ref(c):
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(ref(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{i}")
        )
        aggs.append(distinct_fn(ref(c)).alias(f"__dist_{i}"))
    row = df.agg(*aggs)
    # the name goes into a SQL string literal — escape backslashes
    # first (else with escapedStringLiterals=false a name like 'a\nb'
    # is parsed as an escape sequence), then embedded quotes
    stack_args = ", ".join(
        "'{}', __nulls_{}, __dist_{}".format(
            c.replace("\\", "\\\\").replace("'", "''"), i, i
        )
        for i, c in enumerate(cols)
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
        "__n AS n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


def heavy_hitters(
    df: DataFrame,
    col: str,
    support: float = 0.001,
    k: Optional[int] = None,
) -> DataFrame:
    """EXACT counts of the values whose share exceeds ``support`` —
    without ever shuffling the full value distribution.

    The 100 TB problem: "which tokens/domains/ngrams dominate the
    corpus" as a plain ``groupBy(col).count()`` shuffles one record
    per distinct value per partition, and Zipfian text data is almost
    all hapax legomena — the shuffle is dominated by values that can
    never matter.  Two bounded passes instead:

    1. **Candidates** — ``df.stat.freqItems`` (Spark's Misra-Gries
       variant, JVM-side, ≤ 1/support counters of state per
       partition).  Its guarantee is one-sided: the returned set is a
       SUPERSET of every value with share > support (false positives
       possible, false negatives not).
    2. **Exact pass** — count ONLY the candidates (map-side combine
       bounds the shuffle by |candidates| x partitions) alongside an
       in-plan non-null total, then drop candidates at or below the
       threshold.  The sketch's false positives die here, so the
       result is exact and deterministic even though the candidate
       set itself depends on partitioning.

    Returns ``(value, cnt, share)`` — value cast to string, share of
    NON-NULL rows rounded to 6 decimals — ordered by ``cnt`` desc then
    value asc, truncated to ``k`` rows when given.  NULL is never
    reported (a NULL-heavy column is :func:`skew_report`'s job).

    Spark requires ``support > 1e-4``; smaller thresholds mean a
    candidate state too large for the sketch pass — pre-aggregate or
    raise the threshold.  The input is scanned three times (sketch,
    candidate counts, total); at scale all three are scan+project
    passes with no wide shuffle, which is the point.
    """
    if not (1e-4 < support < 1.0):
        raise ValueError(f"support must be in (1e-4, 1), got {support}")
    if k is not None and k < 1:
        raise ValueError("k must be >= 1")
    c = F.col("`" + col.replace("`", "``") + "`")
    row = df.stat.freqItems([col], support).first()
    cands = [v for v in (row[0] or []) if v is not None]
    spark = df.sparkSession
    if not cands:
        return spark.createDataFrame(
            [], "value string, cnt bigint, share double"
        )
    # small candidate sets go into the plan as an IN-list (fuses into
    # the scan, pushes down); big ones become a broadcast semi-join so
    # the plan text stays bounded
    if len(cands) <= 256:
        filtered = df.filter(c.isin(cands))
    else:
        cand_df = spark.createDataFrame(
            [(v,) for v in cands], df.select(c.alias("__hh_cand")).schema
        )
        filtered = df.join(
            F.broadcast(cand_df), c == F.col("__hh_cand"), "left_semi"
        )
    counts = filtered.groupBy(c.alias("__hh_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(c).alias("__hh_total"))
    out = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > support * F.col("__hh_total"))
        .select(
            F.col("__hh_value").cast("string").alias("value"),
            "cnt",
            F.round(F.col("cnt") / F.col("__hh_total"), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
    )
    return out.limit(k) if k is not None else out


def skew_report(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    top_k: int = 5,
) -> DataFrame:
    """Heavy-hitter report per column — the diagnostic you run BEFORE
    a slow join/groupBy at 100 TB: for each column, the ``top_k`` most
    frequent values with their absolute count and share of all rows.
    A top-1 share near 1.0 on a join key means one reducer gets the
    whole table (salt it or let AQE skew-split); NULL is reported as a
    value like any other since NULL-heavy keys skew just as hard.

    Returns ``(col_name, value, cnt, share, rank)`` with ``value``
    cast to string (long format over heterogeneous column types) and
    ``share`` rounded to 6 decimals.

    Plan: ONE pass — the row is exploded into (col_name, value) pairs
    (|cols| copies of only the inspected columns, not the full row),
    then a single groupBy(col, value) count + per-column rank window.
    The count agg is map-side-combined, so shuffle volume is bounded
    by the DISTINCT pairs, not the row count.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")

    def ref(c):
        return F.col("`" + c.replace("`", "``") + "`")

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        ref(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col_name", "p.value")
    counts = pairs.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("col_name").orderBy(
        F.col("cnt").desc(), F.col("value").asc_nulls_first()
    )
    # total rows IN-PLAN: every input row contributes exactly one
    # (col_name, value) pair per inspected column (NULL included), so
    # sum(cnt) within a col_name partition IS the row count — same
    # scan as the counts themselves (no separate eager df.count(),
    # which both cost an extra full pass and could read a different
    # snapshot of the source than the counts, making share
    # internally inconsistent).
    w_tot = Window.partitionBy("col_name")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn("__total", F.sum("cnt").over(w_tot))
        .filter(F.col("rank") <= top_k)
        .select(
            "col_name",
            "value",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            "rank",
        )
    )


def drop_reason(rules) -> "F.Column":
    """Per-row first-failing-rule label for an ordered filter pipeline.

    ``rules`` is an ordered list of ``(name, keep_predicate)`` pairs;
    a row is labeled with the name of the FIRST rule whose keep
    predicate is not satisfied (NULL predicate = not satisfied, the
    SQL filter convention), or ``'kept'`` if every rule passes.  Pure
    Column expression — map-only, pushes into the scan pipeline.
    """
    rules = list(rules)
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be distinct")
    if "kept" in names:
        raise ValueError("'kept' is the reserved pass label")
    expr = None
    for name, pred in rules:
        fail = ~F.coalesce(pred, F.lit(False))
        expr = F.when(fail, name) if expr is None else expr.when(fail, name)
    return expr.otherwise(F.lit("kept"))


def filter_funnel(df: DataFrame, rules) -> DataFrame:
    """Attribution dashboard for an ordered filter pipeline: one row
    per rule with ``(stage, rule, n_in, n_dropped, n_out)`` under
    first-failure semantics (each document counts against the first
    rule that rejects it — the standard corpus-curation funnel report,
    cf. the per-filter removal tables in Gopher/RefinedWeb/FineWeb
    dataset papers).

    Spark-first shape: ONE scan — every row is labeled with its
    first-failing rule by a pure CASE expression, then a map-side-
    combining groupBy over at most ``len(rules)+1`` labels.  All
    subsequent arithmetic (cumulative drops -> per-stage n_in/n_out)
    happens on that rules-sized table; the row total is the SUM of
    the label counts, so every number comes from the same scan (no
    separate eager count of a possibly-changed source).  Rules that
    drop nothing still appear, with ``n_dropped = 0``.

    At 100 TB this is the cheapest possible shape: the corpus is read
    once, the shuffle carries one partial row per (partition, label).
    """
    rules = list(rules)
    counts = (
        df.select(drop_reason(rules).alias("__reason"))
        .groupBy("__reason")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    order = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(rules)],
        "stage int, rule string",
    )
    staged = order.join(
        counts.withColumnRenamed("__reason", "rule"), "rule", "left"
    ).withColumn("n_dropped", F.coalesce(F.col("cnt"), F.lit(0)))
    w_before = (
        Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, -1)
    )
    total = counts.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("__total"))
    return (
        staged.crossJoin(F.broadcast(total))
        .withColumn(
            "n_in",
            F.col("__total") - F.coalesce(F.sum("n_dropped").over(w_before), F.lit(0)),
        )
        .select(
            "stage",
            "rule",
            "n_in",
            "n_dropped",
            (F.col("n_in") - F.col("n_dropped")).alias("n_out"),
        )
    )


def outliers_mad(
    df: DataFrame,
    group_cols,
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flagging by median absolute deviation:
    a row is an outlier when ``|x - median| > k * 1.4826 * MAD`` (the
    1.4826 factor makes MAD a consistent σ estimate under normality;
    k=3.5 is the conventional cut).  Mean/stddev-based z-scores are
    themselves dragged by the outliers they should catch — MAD is the
    standard robust alternative for pipeline-telemetry gating (value
    drift, feed corruption) on skewed data.

    Adds ``grp_median``, ``grp_mad``, ``is_outlier``.  Degenerate
    groups (MAD = 0: over half the values identical) flag exactly the
    rows that differ from the median — never divide-by-zero, never
    "everything is an outlier".

    Plan: two exact-percentile aggregations (medians of values, then
    of absolute deviations) with map-side combine, each joined back
    broadcast — the group tables are groups-sized by construction.
    The corpus is scanned twice (percentiles are holistic; a one-pass
    approximation would lose the exactness the oracle checks); at
    100 TB use a sampled or approx-percentile variant if two scans
    matter more than exactness.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    reserved = {"grp_median", "grp_mad", "is_outlier", "__absdev"}
    bad = reserved.intersection(df.columns)
    if bad:
        raise ValueError(f"column names collide with output schema: {sorted(bad)}")
    if k <= 0:
        raise ValueError("k must be > 0")
    v = F.col(value_col)
    med = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(0.5)).alias("grp_median")
    )
    with_med = df.join(F.broadcast(med), group_cols)
    mad = (
        with_med.withColumn("__absdev", F.abs(v - F.col("grp_median")))
        .groupBy(*group_cols)
        .agg(F.percentile(F.col("__absdev"), F.lit(0.5)).alias("grp_mad"))
    )
    out = with_med.join(F.broadcast(mad), group_cols)
    dev = F.abs(v - F.col("grp_median"))
    flag = F.when(F.col("grp_mad") == 0, dev > 0).otherwise(
        dev > F.lit(k) * F.lit(1.4826) * F.col("grp_mad")
    )
    return out.withColumn("is_outlier", flag)


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    features: dict,
    eps: float = 1e-6,
):
    """Distribution drift between two corpus snapshots — the
    Population Stability Index, per feature, over fixed histogram
    grids: the standard release gate for a training-data pipeline
    ("did this crawl's length/quality/language mix move?").

    ``features`` maps feature name -> ``(Column, bounds)`` where
    ``bounds`` is the ascending bin grid passed to
    :func:`~pandance_spark.operators.rollup.hist_bin` (``len(bounds)+1``
    bins).  Returns one row per (feature, bin):

    ``feature, bin, n_ref, n_cur, p_ref, p_cur, psi_term`` with
    ``p = max(n/total, eps)`` (the classic zero-protection) and
    ``psi_term = (p_cur - p_ref) * ln(p_cur / p_ref)``, both rounded
    to 9 dp.  ``SUM(psi_term)`` per feature is the PSI
    (rule of thumb: < 0.1 stable, 0.1-0.25 moderate, > 0.25 major).

    Spark-first shape: each side is scanned ONCE for ALL features (a
    union of per-feature bin projections fuses into the scan;
    conditional-count aggregation is map-side combined), one shuffle
    on (feature, bin) whose cardinality is features x bins —
    independent of corpus size — and the per-feature totals come from
    a window over that tiny aggregate.  NULL/NaN rows are excluded per
    feature (hist_bin's NaN-top/NULL-0 quirks never reach the
    histogram), so a feature's total is its non-null count.
    """
    from pandance_spark.operators.rollup import hist_bin

    if not features:
        raise ValueError("features must be non-empty")
    sides = []
    for side, df in (("ref", ref), ("cur", cur)):
        parts = []
        for name in sorted(features):
            col, bounds = features[name]
            v = col.cast("double")
            parts.append(
                df.select(
                    F.lit(name).alias("feature"),
                    F.when(
                        v.isNotNull() & ~F.isnan(v), hist_bin(v, bounds)
                    ).alias("bin"),
                    F.lit(side).alias("side"),
                ).filter(F.col("bin").isNotNull())
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        sides.append(u)
    counts = (
        sides[0]
        .unionAll(sides[1])
        .groupBy("feature", "bin")
        .agg(
            F.sum((F.col("side") == "ref").cast("long")).alias("n_ref"),
            F.sum((F.col("side") == "cur").cast("long")).alias("n_cur"),
        )
    )
    w = Window.partitionBy("feature")
    t_ref = F.sum("n_ref").over(w)
    t_cur = F.sum("n_cur").over(w)
    # a side with ZERO non-null rows for a feature makes its total 0;
    # n/0 is NULL under default config (and the greatest() clamp would
    # silently hide it) but raises DIVIDE_BY_ZERO under ANSI mode
    # (Spark 4.x default) — guard the ratio explicitly so an empty
    # side degrades to the eps floor in BOTH modes (ADVICE r8)
    p_ref = F.greatest(
        F.when(t_ref > 0, F.col("n_ref") / t_ref), F.lit(float(eps))
    )
    p_cur = F.greatest(
        F.when(t_cur > 0, F.col("n_cur") / t_cur), F.lit(float(eps))
    )
    return counts.select(
        "feature",
        F.col("bin").cast("long"),
        "n_ref",
        "n_cur",
        F.round(p_ref, 9).alias("p_ref"),
        F.round(p_cur, 9).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 9).alias(
            "psi_term"
        ),
    )


# Benford expected first-digit mass, log10(1 + 1/d): shared literals —
# injecting the SAME doubles into the Spark plan and any SQL replay
# sidesteps cross-engine log10 ulp drift entirely
BENFORD_EXPECTED = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit audit against Benford's law — the
    classic fabricated-/corrupted-numbers smell test for financial and
    telemetry columns.  Rows with ``value >= 1`` contribute their
    leading digit; the report has one row per digit 1-9 (digits absent
    from the data included with n=0): observed count, observed
    fraction, Benford's expected fraction, and the chi-square
    contribution ``(obs - exp)^2 / exp``.

    Exactness: the digit comes from the INTEGER part's string form
    (``substring(cast(floor(v) as bigint), 1, 1)``) — integer-to-string
    is identical in every engine, where double-to-string shortest-repr
    and float log10 are not; expected fractions are shared literals
    (see ``BENFORD_EXPECTED``).  One groupBy on a 9-value key + a
    broadcast total: scan-bound at any scale.
    """
    spark = df.sparkSession
    # >= 1 drops NaN and -Inf by comparison semantics; +Inf and
    # values past int64 are dropped explicitly — Spark clamps the
    # bigint cast where DuckDB errors, and a clamped digit is a lie
    vals = df.select(F.col(value_col).cast("double").alias("v")).filter(
        (F.col("v") >= 1.0) & (F.col("v") < F.lit(9.2e18))
    )
    digit = F.substring(
        F.floor(F.col("v")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = vals.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    total = counts.agg(F.sum("n").alias("total"))
    exp_expr = F.element_at(
        F.create_map(
            *[
                x
                for d in range(1, 10)
                for x in (F.lit(d), F.lit(BENFORD_EXPECTED[d]))
            ]
        ),
        F.col("digit"),
    )
    out = (
        digits.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            (
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.col("total").cast("double")
            ).alias("of"),
            exp_expr.alias("ef"),
        )
    )
    return out.select(
        "digit",
        "n",
        F.round("of", 9).alias("obs_frac"),
        F.round("ef", 9).alias("exp_frac"),
        F.round(
            (F.col("of") - F.col("ef"))
            * (F.col("of") - F.col("ef"))
            / F.col("ef"),
            9,
        ).alias("chi2_contrib"),
    )
