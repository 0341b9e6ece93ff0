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

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["heavy_hitters", "profile_table", "skew_report"]


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
