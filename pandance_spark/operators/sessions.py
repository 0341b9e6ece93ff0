"""Sessionization: gap-based event grouping per key.

Extension surface (SURVEY.md §2.3 demonstrated it as a query since
round 1; this promotes it to a reusable operator).  The batch
counterpart of the streaming session windows in
``pandance_spark.streaming`` — same semantics, expressed as a lag +
running-sum window pair.

Plan: ONE hash shuffle on the keys; the gap-detect lag window and the
session-number running sum share the same (partitionBy, orderBy), so
Catalyst plans a single Exchange + Sort and both windows run in one
pass.  Per-key data streams through the window operators — nothing is
collected per key.
"""

from __future__ import annotations

import datetime as dt
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandance_spark._kernel import as_instant, is_timestamp_type

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    keys,
    ts_col: str,
    gap,
    order_cols: Optional[Sequence[str]] = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Append a 1-based per-key session index: a new session starts
    when the time since the key's previous event exceeds ``gap``.

    ``gap`` is a ``datetime.timedelta`` for timestamp columns, or a
    number (same unit as the column) for numeric event times.
    ``order_cols`` breaks equal-timestamp ordering ties
    deterministically (e.g. an event id) — without them, same-``ts``
    events order unspecified and the session boundary can wobble
    between runs.

    Timestamps may arrive as TIMESTAMP_NTZ (naive parquet micros);
    only gap DIFFERENCES are used, so the timezone interpretation
    cancels (same normalization as the sessionize driver query).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = list(order_cols or [])
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    )
    if is_timestamp_type(df.schema[ts_col].dataType):
        if not isinstance(gap, dt.timedelta):
            raise TypeError("timestamp ts_col requires a timedelta gap")
        ts = as_instant(F.col(ts_col))
        delta = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
        thresh = F.lit(int(gap.total_seconds() * 1_000_000))
    else:
        if isinstance(gap, dt.timedelta):
            raise TypeError("numeric ts_col requires a numeric gap")
        delta = F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
        thresh = F.lit(gap)
    is_new = F.when(delta > thresh, 1).otherwise(0)
    return df.withColumn(
        out_col,
        (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1)
        .cast("long"),
    )
