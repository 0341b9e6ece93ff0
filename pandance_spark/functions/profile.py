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

__all__ = ["profile_table", "skew_report"]


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
