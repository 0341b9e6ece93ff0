"""Structured Streaming extensions.

The reference is batch-only (SURVEY.md §2.3 — no streams, watermarks or
state); these are Spark-native extensions giving the engine's pipeline
operators a streaming surface:

- ``read_events_stream``: file-source stream over the testdata events
  table (handles the TIMESTAMP(NANOS) parquet the same way the batch
  loader does).
- ``windowed_event_counts``: watermarked sliding-window aggregation.
- ``streaming_dedup``: exact dedup with bounded state
  (``dropDuplicatesWithinWatermark``) — the streaming analog of
  ``operators/dedup.dedup_exact``.
- ``sessionize_stream``: session windows per user via
  ``session_window`` (gap-based), the streaming analog of the batch
  ``sessionize`` query in ``__spark_entry__``.

All return unstarted streaming DataFrames; callers pick the sink.
For tests: memory sink + ``processAllAvailable()`` drives a parquet
batch through the full streaming engine synchronously.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "streaming_dedup",
    "sessionize_stream",
    "running_user_stats",
]


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    """Streaming read of the events table (file source).

    Streaming sources need an explicit schema; we take it from a batch
    read, then apply the same nanos->micros timestamp conversion as
    ``sources.load_table``.
    """
    from pandance_spark.sources import configure_session, load_table

    configure_session(spark)
    path = os.path.join(sf_dir, "events.parquet")
    # the file stream source requires a DIRECTORY; stage a symlink dir
    # (deterministic per sf_dir so repeated calls reuse it)
    import hashlib
    import tempfile

    tag = hashlib.md5(path.encode()).hexdigest()[:12]
    stage_dir = os.path.join(tempfile.gettempdir(), f"pdx_stream_{tag}")
    os.makedirs(stage_dir, exist_ok=True)
    link = os.path.join(stage_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    raw_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stage_dir)
    if dict(df.dtypes).get("ts") == "bigint":  # nanosAsLong in effect
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked (sliding) window counts per event_type.

    Late rows beyond ``watermark`` are dropped and window state is
    reclaimed — bounded state at unbounded input, the property that
    matters at 100 TB/day ingest.
    """
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key only until the
    watermark passes it — state size is bounded by the watermark
    horizon, not the stream length.
    """
    return events.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def running_user_stats(
    events: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count / value sum / high-water timestamp, one updated
    row emitted per user per micro-batch.

    This is the escape hatch for stateful logic the built-in streaming
    aggregations can't express (arbitrary per-group state transition
    functions).  State is an explicit (count, total, last_ts) tuple the
    function owns; the engine handles shuffling by key, state store
    persistence and recovery.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("last_ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("last_us", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            if len(pdf):
                batch_max = pdf["ts"].max()
                last_us = max(last_us, int(batch_max.value) // 1000)
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows per user (streaming sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
