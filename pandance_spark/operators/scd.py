"""Slowly-changing-dimension type-2 history over change logs.

Completes the MERGE family (``merge_upsert`` keeps only the latest
version; SCD2 keeps every version with a validity interval) — the
standard shape for dimension history in a warehouse and for
"as-of-training-cutoff" snapshots of metadata tables in a data
pipeline.

Reference scope note: the pandas reference
(``pandance/pandance.py``) has no SCD operator; this extends the
inherited relational surface (SURVEY.md §2.3/§2.4) the same way
``merge_upsert`` (merge.py) does, using only window functions over
one key-partitioned shuffle.

Scale design (100 TB):

* ``scd2_history`` is ONE shuffle on the key columns; the
  change-detection window and the interval window share the same
  (partitionBy, orderBy), so Catalyst reuses a single Exchange for
  both Window operators — ``.explain`` shows one
  ``Exchange hashpartitioning(keys)`` feeding two ``Window`` nodes.
* No driver-side state, no UDFs — whole-stage codegen end to end.
* ``scd2_apply`` recomputes only from (current dimension versions +
  the update batch); at petabyte dimension scale pair it with a
  key-bucketed layout (``save_bucketed`` /
  ``streaming.stream_upsert_sink``'s ``__bucket`` scheme) so the
  rewrite touches only the buckets with updated keys.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_history", "scd2_apply"]


def _changed_vs_prev(attrs: Sequence[str], w) -> Column:
    """True on the first row per key or when any tracked attribute
    differs (null-safely) from the chronologically previous row."""
    is_first = F.lag(F.lit(1)).over(w).isNull()
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    return is_first | changed


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str,
    order_cols: Optional[Sequence[str]] = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Input: one row per observed state ``(keys..., attrs..., ts_col)``
    — an event stream, CDC feed, or repeated snapshot dump.  Output:
    one row per *version*: consecutive rows (per key, ordered by
    ``ts_col`` then ``order_cols``) whose tracked ``attrs`` are
    unchanged collapse into one interval::

        keys..., attrs..., valid_from, valid_to, is_current

    ``valid_to`` is the next version's ``valid_from`` (half-open
    interval, NULL on the latest version); ``is_current`` marks the
    open interval.  Attribute comparison is null-safe (NULL -> NULL is
    "unchanged").

    ``order_cols`` breaks ordering ties deterministically when two
    observations of one key share a timestamp (e.g. an event id).

    Plan: one hash shuffle on ``keys``; the lag (change-detect) and
    lead (interval-close) windows share that partitioning, so there is
    no second Exchange.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    attrs = [attrs] if isinstance(attrs, str) else list(attrs)
    order_cols = list(order_cols or [])
    for c in (valid_from, valid_to, is_current):
        if c in keys or c in attrs:
            raise ValueError(f"output column {c!r} collides with an input column")

    w = Window.partitionBy(*keys).orderBy(
        *[F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    )
    # only carry order_cols that aren't already present as keys/attrs
    # (a duplicate name would make the w2 references ambiguous)
    extra_order = [c for c in order_cols if c not in keys and c not in attrs]
    versions = (
        df.select(*keys, *attrs, ts_col, *order_cols)
        .withColumn("__chg", _changed_vs_prev(attrs, w))
        .filter(F.col("__chg"))
        .select(*keys, *attrs, F.col(ts_col).alias(valid_from), *extra_order)
    )
    # same partitionBy -> the Exchange from the lag window is reused.
    # order_cols MUST participate here too: two surviving versions can
    # share valid_from (equal-timestamp observations whose attrs both
    # changed), and ordering by valid_from alone would leave their
    # valid_to/is_current assignment to unspecified sort stability —
    # wrong under spill-merge at scale even when small runs pass.
    w2 = Window.partitionBy(*keys).orderBy(
        *[F.col(valid_from).asc()] + [F.col(c).asc() for c in order_cols]
    )
    return versions.select(
        *keys,
        *attrs,
        valid_from,
        F.lead(F.col(valid_from)).over(w2).alias(valid_to),
        F.lead(F.col(valid_from)).over(w2).isNull().alias(is_current),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str,
    order_cols: Optional[Sequence[str]] = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply an update batch to an existing SCD2 dimension.

    ``dim`` is a previous :func:`scd2_history`-shaped table
    (``keys..., attrs..., valid_from, valid_to, is_current``);
    ``updates`` is a new batch of observations (``keys..., attrs...,
    ts_col``).  Returns the merged SCD2 table: updated keys get their
    open interval closed at the update's timestamp and a new current
    version; updates whose attributes equal the key's latest version
    are no-ops (no spurious version); late-arriving updates splice
    into history at their timestamp position.

    Implementation: re-derive intervals from the union of existing
    version starts and the new observations — exactly
    :func:`scd2_history` over ``dim``'s (keys, attrs, valid_from)
    rows plus the batch.  This is idempotent (re-applying the same
    batch changes nothing) and assumes the standard SCD2 invariant
    that intervals per key are contiguous (each ``valid_to`` equals
    the next ``valid_from``), which :func:`scd2_history` guarantees.

    ``order_cols`` tie-breaks equal-timestamp observations *within the
    batch*; existing dimension versions carry NULLs there (their
    original order value is not retained), so at an exact-timestamp
    tie the established version sorts first and the update becomes
    the newer observation.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    attrs = [attrs] if isinstance(attrs, str) else list(attrs)
    order_cols = list(order_cols or [])
    existing = dim.select(
        *keys,
        *attrs,
        F.col(valid_from).alias("__ts"),
        *[
            F.lit(None).cast(updates.schema[c].dataType).alias(c)
            for c in order_cols
        ],
    )
    batch = updates.select(*keys, *attrs, F.col(ts_col).alias("__ts"), *order_cols)
    return scd2_history(
        existing.unionByName(batch),
        keys,
        attrs,
        "__ts",
        order_cols=order_cols,
        valid_from=valid_from,
        valid_to=valid_to,
        is_current=is_current,
    )
