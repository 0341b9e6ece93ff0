"""Sources: loading the standard test/benchmark tables.

The reference has no storage layer — its operators consume caller-built
pandas frames (SURVEY.md §2.3).  Here the engine is Spark, so sources
are first-class: parquet with predicate pushdown and column pruning.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "configure_session",
    "read_any",
    "read_jsonl",
    "read_csv_quarantine",
    "warc_records",
    "save_bucketed",
    "write_table",
]


def configure_session(spark: SparkSession) -> SparkSession:
    """Pin runtime confs the engine's semantics rely on.

    - UTC session timezone so timestamp arithmetic matches the DuckDB
      oracle (parquet timestamps are naive; DuckDB treats them as UTC).
    - AQE on for runtime re-planning (coalesce, skew join).
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        # band joins can produce hot partitions (skewed keys, dense
        # buckets); AQE splits skewed partitions at runtime
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        # Spark cannot scan parquet TIMESTAMP(NANOS) columns natively;
        # read them as long nanos and convert (truncate) to micros —
        # the same truncation DuckDB applies casting TIMESTAMP_NS ->
        # TIMESTAMP, so oracle comparisons agree.
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def _nanos_columns(path: str):
    """Column names stored as parquet timestamp[ns] (via file metadata)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    configure_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for c in _nanos_columns(path):
        if c in df.columns:
            # integer `div` (not `/`): nanos ~1.7e18 exceed double's 2^53
            # exact-integer range, float division would corrupt low bits
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_any(spark: SparkSession, path: str, fmt: str = "parquet", schema=None,
             **options) -> DataFrame:
    """Format-dispatching reader (parquet/orc/csv/json).

    Always pass an explicit ``schema`` for csv/json in production —
    inference scans the data twice and types drift between runs."""
    configure_session(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    return reader.options(**options).format(fmt).load(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols,
    num_buckets: int = 32,
    sort_cols=None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    Two tables bucketed on the same key with the same bucket count
    equi-join WITHOUT a shuffle — the pre-partitioning replaces the
    exchange, the single biggest lever for repeated joins over 100 TB
    fact tables.  (Requires ``saveAsTable``; plain ``.save(path)``
    cannot record bucketing metadata.)

    With ``mode="overwrite"`` an orphaned warehouse directory (the
    in-memory catalog forgets tables across sessions while the
    directory persists) is deleted and the write retried once:
    overwrite semantics mean the caller owns the location, so a
    leftover from a dead session must not wedge every later run.

    The frame is repartitioned to ``hashpartitioning(bucket_cols,
    num_buckets)`` before the write: Spark's bucket file layout is
    one file per (write task x bucket), so an unaligned upstream
    partitioning fans out to ``tasks * num_buckets`` small files —
    aligning it yields exactly ``num_buckets`` files (and caps write
    parallelism at ``num_buckets``; size the bucket count for the
    table, not the toy default, when writing 100 TB).
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if mode == "overwrite":
        # drop first so overwrite can't hit LOCATION_ALREADY_EXISTS
        # for a table the catalog still knows about
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    # repartition uses the same Murmur3 hash as the bucket spec, so
    # each write task holds exactly one bucket's rows
    df = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    _save_as_table(
        writer.format("parquet"), df.sparkSession, table,
        recover_orphan=(mode == "overwrite"),
    )


def save_table(df: DataFrame, table: str, mode: str = "overwrite") -> None:
    """Persist as a plain managed catalog table (no bucketing), with the
    same orphaned-location recovery as :func:`save_bucketed`."""
    if mode == "overwrite":
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    _save_as_table(
        df.write.mode(mode).format("parquet"), df.sparkSession, table,
        recover_orphan=(mode == "overwrite"),
    )


def _save_as_table(writer, spark, table: str, recover_orphan: bool) -> None:
    try:
        writer.saveAsTable(table)
    except Exception as e:
        if "LOCATION_ALREADY_EXISTS" not in str(e):
            raise
        if not recover_orphan:
            raise RuntimeError(
                f"table {table!r} has an orphaned warehouse directory from a "
                "previous session (in-memory catalog lost the table entry). "
                "Remove the directory under spark.sql.warehouse.dir, pick a "
                "new table name, or write with mode='overwrite'."
            ) from e
        # overwrite owns the location: remove the orphan (Hadoop FS API
        # so any warehouse store works) and retry once
        jvm = spark._jvm
        m = _re.search(r"LOCATION_ALREADY_EXISTS[^']*'(?:file:)?([^']+)'", str(e))
        loc = m.group(1) if m else None
        if loc is None:
            wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            loc = os.path.join(wh, table.split(".")[-1].lower())
        hpath = jvm.org.apache.hadoop.fs.Path(loc)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
        writer.saveAsTable(table)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by=None,
    **options,
) -> None:
    """Format-dispatching writer.  ``partition_by`` columns become
    directory partitions — the layout that gives downstream readers
    partition pruning for free."""
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(
            *([partition_by] if isinstance(partition_by, str) else partition_by)
        )
    if fmt == "csv" and "header" not in options:
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
):
    """Schema-enforced JSONL reader with corrupt-record quarantine.

    Returns ``(good, bad, unpersist)``: rows parsing cleanly against
    ``schema`` (without the corrupt column), quarantined raw lines
    (the corrupt column only), and a zero-arg cleanup callable.
    PERMISSIVE mode keeps the scan single-pass at any scale — bad
    lines don't abort the 100 TB job, they land in a side output for
    inspection/replay (the standard ingest contract for
    crawled/exported corpora).

    Spark quirk: a PERMISSIVE read materializes the corrupt column
    only if it is part of the declared schema, and rows referencing
    ONLY the corrupt column must be disambiguated through a cached or
    re-planned frame — hence both outputs share one cached scan.

    **Cache lifetime**: the shared cache pins executor storage until
    released.  Call ``unpersist()`` once both branches have been
    consumed (written out / materialized) — repeated ingest calls in a
    long-lived session otherwise accumulate cached blocks until Spark
    evicts them under pressure.  After ``unpersist()`` the cache
    boundary is gone, so Spark's corrupt-record-only restriction
    (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``)
    applies again: any query whose pruned column set is just the
    corrupt column fails — all of ``bad``, and even ``good.count()``
    (count prunes every output column, leaving only the filter's
    corrupt reference).  Treat both branches as consumed once
    released; persist anything you still need first.
    """
    from pyspark.sql import types as T

    configure_session(spark)
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    return _quarantine_split(reader.json(path), corrupt_col)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
    **options,
):
    """CSV sibling of :func:`read_jsonl` — same quarantine contract
    (``(good, bad, unpersist)``, PERMISSIVE single-pass scan, same
    cache-lifetime caveats; see that docstring).  ``options`` pass
    through to the CSV reader (``header`` defaults to true, matching
    :func:`read_any`); rows whose fields fail to parse against
    ``schema`` land raw in ``bad`` instead of aborting the job.
    """
    from pyspark.sql import types as T

    configure_session(spark)
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    if "header" not in options:
        options["header"] = "true"
    # caller options go FIRST so they can never override the two
    # settings the quarantine contract depends on (a caller-supplied
    # mode='DROPMALFORMED' would silently empty the bad frame)
    clash = {"mode", "columnnameofcorruptrecord"} & {
        k.lower() for k in options
    }
    if clash:
        raise ValueError(
            f"options {sorted(clash)} are fixed by the quarantine "
            "contract (PERMISSIVE + corrupt-record column) and cannot "
            "be overridden"
        )
    reader = (
        spark.read.schema(full)
        .options(**options)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    return _quarantine_split(reader.csv(path), corrupt_col)


def _quarantine_split(df, corrupt_col: str):
    """Split a PERMISSIVE scan into (good, bad, unpersist) over ONE
    cached pass.  Spark refuses filters on the corrupt column alone
    over the raw scan; the cache() boundary makes the split legal and
    single-scan (see read_jsonl's docstring for the cache lifetime
    contract)."""
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)

    def unpersist(blocking: bool = False):
        df.unpersist(blocking)

    return good, bad, unpersist


from pandance_spark.sources.warc import warc_records  # noqa: E402


def read_xml_quarantine(
    spark: SparkSession,
    path: str,
    schema,
    row_tag: str = "row",
    corrupt_col: str = "_corrupt_record",
):
    """XML sibling of :func:`read_jsonl` — same quarantine contract
    (``(good, bad, unpersist)``, PERMISSIVE single-pass scan, same
    cache-lifetime caveats; see that docstring).  Uses Spark 4's
    native XML source (no external package): each ``row_tag`` element
    parses against ``schema``; malformed elements land raw in ``bad``.
    Feeds/sitemaps/exports are the usual carriers — the formats
    crawled corpora arrive in when they don't arrive as JSONL."""
    from pyspark.sql import types as T

    configure_session(spark)
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("rowTag", row_tag)
    )
    return _quarantine_split(reader.format("xml").load(path), corrupt_col)
