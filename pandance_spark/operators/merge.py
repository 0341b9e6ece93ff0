"""Batch MERGE (upsert) emulation — SURVEY.md §2.4 extension surface.

Training-data pipelines continuously fold fresh crawl/annotation drops
into a canonical table.  Lakehouse formats expose this as ``MERGE
INTO``; on plain parquet the same semantics compose from one relational
plan: a single full-outer join on the key, with per-column precedence.

Spark-first design: ONE shuffle (the full-outer hash/sort-merge join on
the key).  No driver-side row handling, no per-row UDFs; AQE picks the
physical join and re-splits skewed keys.  At 100 TB the rewrite cost is
the join plus the table write — the same floor a lakehouse MERGE pays
when every file overlaps the source keys.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "apply_changes", "table_diff"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    update_cols: Optional[Sequence[str]] = None,
    insert_unmatched: bool = True,
    delete_missing: bool = False,
) -> DataFrame:
    """SQL-MERGE semantics over two same-schema DataFrames.

    - key match in both: source values win for ``update_cols``
      (default: every non-key column), target values kept otherwise;
    - source-only keys: inserted when ``insert_unmatched`` (WHEN NOT
      MATCHED THEN INSERT);
    - target-only keys: kept, or dropped when ``delete_missing`` (WHEN
      NOT MATCHED BY SOURCE THEN DELETE).

    Both inputs must be key-unique (standard MERGE precondition; a
    many-row source per key makes MERGE nondeterministic in every
    engine).  Returns the merged table with the target's column order.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    for k in keys:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"key column {k!r} missing from an input")
    missing = set(source.columns) - set(target.columns)
    if missing:
        raise ValueError(f"source has columns absent from target: {sorted(missing)}")
    payload = [c for c in target.columns if c not in keys]
    upd = set(payload if update_cols is None else update_cols) & set(source.columns)

    t = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in target.columns],
        F.lit(1).alias("__in_t"),
    )
    s = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in source.columns],
        F.lit(1).alias("__in_s"),
    )
    cond = None
    for k in keys:
        eq = t[f"__t_{k}"] == s[f"__s_{k}"]
        cond = eq if cond is None else (cond & eq)
    j = t.join(s, cond, "full_outer")

    in_t = F.col("__in_t").isNotNull()
    in_s = F.col("__in_s").isNotNull()
    keep = in_t if not delete_missing else (in_t & in_s)
    if insert_unmatched:
        keep = keep | (in_s & ~in_t)

    def _pick(c: str):
        tcol, scol = F.col(f"__t_{c}"), F.col(f"__s_{c}")
        if c in keys:
            return F.coalesce(tcol, scol).alias(c)
        if c not in source.columns:
            # target-only column: kept on match, NULL on insert
            return tcol.alias(c)
        if c in upd:
            # updated on match, source value on insert
            return F.when(in_s, scol).otherwise(tcol).alias(c)
        # not an update column: target value on match, source on insert
        return F.when(in_t, tcol).otherwise(scol).alias(c)

    return j.filter(keep).select(*[_pick(c) for c in target.columns])


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change feed to a snapshot — the Delta
    ``APPLY CHANGES`` / Debezium-consumer pattern: ``changes`` carries
    upserts and deletes (``op_col`` equal to ``delete_op`` marks a
    delete; anything else is an upsert) ordered per key by
    ``order_col`` (a version / LSN / commit timestamp).  The NET
    effect per key is the latest change:

    - latest change is an upsert  → that row replaces/creates the key;
    - latest change is a delete   → the key is removed;
    - key untouched by the feed   → the snapshot row passes through.

    Plan shape: ONE window shuffle on the key over the (usually much
    smaller) change feed picks each key's latest change, then the
    snapshot anti-joins the touched-key set and unions the surviving
    upserts — the snapshot itself is never window-sorted and shuffles
    only for the join, which AQE broadcasts when the feed is small:
    at 100 TB the cost is one pass over the snapshot plus work ∝ the
    feed, the same floor a lakehouse MERGE pays.

    Ties on ``order_col`` within a key break deterministically on a
    value hash of the change row (so re-running with a different
    partitioning cannot flip the winner); give changes unique
    per-key versions to make the tie-break irrelevant.

    ``changes`` must carry every snapshot column plus ``op_col``;
    delete rows only need the keys and ``order_col`` populated.
    Returns the new snapshot with the original column order.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    for c in keys + [order_col]:
        if c not in changes.columns:
            raise ValueError(f"changes is missing column {c!r}")
    if op_col not in changes.columns:
        raise ValueError(f"changes is missing op column {op_col!r}")
    missing = set(snapshot.columns) - set(changes.columns)
    if missing:
        raise ValueError(
            f"changes is missing snapshot columns: {sorted(missing)}"
        )

    from pyspark.sql import Window

    # the tie hash covers EVERY change column (incl. op and version —
    # a delete and an upsert tying on order_col must not hash equal)
    # with an explicit NULL sentinel: concat_ws SKIPS nulls, which
    # would make ('x', NULL) and (NULL, 'x') collide
    tie_cols = list(dict.fromkeys(snapshot.columns + [op_col, order_col]))
    tie = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in tie_cols
            ],
        )
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), tie.desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # NULL op counts as an upsert ("anything else"), not a silent drop
    is_delete = F.coalesce(F.col(op_col) == delete_op, F.lit(False))
    survivors = latest.filter(~is_delete).select(*snapshot.columns)
    untouched = snapshot.join(
        latest.select(*keys), keys, "left_anti"
    )
    return untouched.unionByName(survivors)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Row-level diff between two versions of a keyed table — the
    read-side companion of :func:`merge_upsert`: regression-detect
    between corpus builds, audit what an ingestion batch actually
    changed, or validate a migration.

    Returns ``(key_cols..., change, changed_cols)`` with ``change`` in
    ``'added'`` (key only in ``new``), ``'removed'`` (only in ``old``)
    or ``'changed'`` (key in both, at least one compared column
    differs; ``changed_cols`` lists them).  Unchanged keys are omitted
    — at 100 TB the diff output is proportional to the churn, not the
    table.  Comparison is null-safe (NULL -> value and value -> NULL
    both count as changes; NULL -> NULL does not).

    ``compare_cols`` defaults to every shared non-key column.  Plan:
    ONE full-outer join on the keys (AQE picks the physical join and
    re-splits skew), then a pure projection — same shape and cost
    floor as the upsert itself.

    Precondition (same as :func:`merge_upsert`): ``key_cols`` must
    uniquely identify rows on BOTH sides.  Duplicate keys fan out in
    the full-outer join and emit one (possibly contradictory)
    ``'changed'`` row per old x new pairing — this function does not
    detect that; deduplicate or aggregate first if keys can repeat.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    compare_cols = list(compare_cols)
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = o[f"__ko_{k}"].eqNullSafe(n[f"__kn_{k}"])
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    changed_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]
        )
        if compare_cols
        else F.array().cast("array<string>"),
        lambda x: x.isNotNull(),
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
                for k in keys
            ],
            "change",
            F.when(F.col("change") == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
