"""Source/sink round-trip tests (the reference has no storage layer —
SURVEY.md §2.3; Spark provides it, these prove the engine's surface)."""

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pandance_spark import fuzzy_join
from pandance_spark.plans.mem import estimate_mem_cost_cartesian
from pandance_spark.sources import load_table, read_any, register_views, write_table


@pytest.fixture(scope="module")
def tmpdir():
    with tempfile.TemporaryDirectory(prefix="pdx_sources_") as d:
        yield d


def test_parquet_partitioned_roundtrip(spark, sf_dir, tmpdir):
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(tmpdir, "events_part")
    write_table(ev, out, fmt="parquet", partition_by="event_type")
    back = read_any(spark, out, "parquet")
    assert back.count() == ev.count()
    # partition pruning: a filter on the partition column must prune paths
    pruned = back.filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert pruned.count() == ev.filter(F.col("event_type") == "click").count()


def test_csv_json_roundtrip(spark, sf_dir, tmpdir):
    nation = load_table(spark, sf_dir, "nation")
    for fmt in ("csv", "json", "orc"):
        out = os.path.join(tmpdir, f"nation_{fmt}")
        write_table(nation, out, fmt=fmt)
        back = read_any(spark, out, fmt, schema=nation.schema)
        assert back.count() == 25
        assert {r["n_name"] for r in back.collect()} == {
            r["n_name"] for r in nation.collect()
        }


def test_register_views_sql(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql(
        "SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).first()[0]
    assert n > 0


def test_mem_estimator_positive(spark, sf_dir):
    a = load_table(spark, sf_dir, "customer")
    b = load_table(spark, sf_dir, "supplier")
    mib = estimate_mem_cost_cartesian(a, b)
    assert mib >= 0  # advisory, never raises


def test_fuzzy_join_on_dates(spark):
    d = dt.date
    left = spark.createDataFrame(
        [(1, d(2024, 1, 10)), (2, d(2024, 3, 1))], "id long, day date"
    )
    right = spark.createDataFrame(
        [(10, d(2024, 1, 12)), (20, d(2024, 6, 30))], "id long, day date"
    )
    out = fuzzy_join(left, right, on="day", tol=dt.timedelta(days=3))
    got = {(r["id_x"], r["id_y"]) for r in out.collect()}
    assert got == {(1, 10)}


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmpdir):
    from pandance_spark.sources import save_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        save_bucketed(orders, "orders_b", "o_orderkey", num_buckets=8,
                      sort_cols="o_orderkey")
        save_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b", "o_orderkey", num_buckets=8, sort_cols="o_orderkey",
        )
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no Exchange on either side
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    import json as _json

    from pyspark.sql import types as T

    from pandance_spark.sources import read_jsonl

    p = tmp_path / "docs.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "hello world"}),
        '{"doc_id": 2, "text": "ok"}',
        '{"doc_id": "NOT AN INT AND UNCLOSED',   # corrupt
        _json.dumps({"doc_id": 3, "text": None}),
    ]
    p.write_text("\n".join(lines) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, bad, unpersist = read_jsonl(spark, str(p), schema)
    got = sorted((r["doc_id"], r["text"]) for r in good.collect())
    assert got == [(1, "hello world"), (2, "ok"), (3, None)]
    assert good.columns == ["doc_id", "text"]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "UNCLOSED" in bad_rows[0][0]
    # releasing the shared scan cache: queries whose pruned columns
    # are corrupt-only become illegal again (documented
    # persist-before-release contract); wide projections recompute
    unpersist(blocking=True)
    assert len(good.collect()) == 3
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        bad.count()


def test_save_bucketed_recovers_orphaned_location(spark, tmpdir):
    """A warehouse directory left behind by a dead session (catalog
    entry gone, files present) must not wedge overwrite writes."""
    import os

    from pandance_spark.sources import save_bucketed

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(wh, "orphan_tbl")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "stale.parquet"), "w") as f:
        f.write("not parquet")
    spark.sql("DROP TABLE IF EXISTS orphan_tbl")  # catalog has no entry

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    save_bucketed(df, "orphan_tbl", "k", num_buckets=2)
    assert spark.table("orphan_tbl").count() == 2
    spark.sql("DROP TABLE IF EXISTS orphan_tbl")


def test_read_csv_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from pandance_spark.sources import read_csv_quarantine

    p = tmp_path / "in.csv"
    p.write_text(
        "id,price,label\n"
        "1,10.5,ok\n"
        "2,notanumber,bad-price\n"
        "3,7.25,fine\n"
        ",alsobad,\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("label", T.StringType()),
        ]
    )
    good, bad, unpersist = read_csv_quarantine(spark, str(p), schema)
    g = {r["id"]: (r["price"], r["label"]) for r in good.collect()}
    b = [r["_corrupt_record"] for r in bad.collect()]
    assert g == {1: (10.5, "ok"), 3: (7.25, "fine")}
    assert sorted(b) == [",alsobad,", "2,notanumber,bad-price"]
    assert good.columns == ["id", "price", "label"]
    unpersist()


def test_read_csv_quarantine_rejects_contract_overrides(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import types as T
    from pandance_spark.sources import read_csv_quarantine

    p = tmp_path / "x.csv"
    p.write_text("a\n1\n")
    schema = T.StructType([T.StructField("a", T.IntegerType())])
    with _pytest.raises(ValueError, match="quarantine"):
        read_csv_quarantine(spark, str(p), schema, mode="DROPMALFORMED")
    with _pytest.raises(ValueError, match="quarantine"):
        read_csv_quarantine(
            spark, str(p), schema, columnNameOfCorruptRecord="zzz"
        )


def test_read_xml_quarantine_contract(spark, tmp_path):
    """Native-XML quarantine (Spark 4): type-corrupt elements land in
    bad, valid planted rows parse, field-less elements become all-NULL
    good rows (XML's structural limit, pinned here)."""
    import os

    from pyspark.sql import types as T

    from pandance_spark.sources import read_xml_quarantine

    d = str(tmp_path / "x")
    df = spark.createDataFrame(
        [(1, "s0", "hello"), (2, "s1", "world")],
        "doc_id long, source string, text string",
    )
    df.coalesce(1).write.option("rootTag", "rows").option(
        "rowTag", "row"
    ).format("xml").save(d)
    with open(os.path.join(d, "part-corrupt.xml"), "w") as f:
        f.write(
            "<rows>\n"
            "<row><doc_id>bad</doc_id><source>s</source>"
            "<text>x</text></row>\n"
            "<row><doc_id>12</doc_id><source>ok</source>"
            "<text>fine</text></row>\n"
            "<row>garbage</row>\n"
            "</rows>"
        )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, bad, unp = read_xml_quarantine(spark, d, schema, "row")
    n_bad = bad.count()
    rows = good.collect()
    unp()
    ids = {r["doc_id"] for r in rows}
    assert n_bad == 1
    assert {1, 2, 12} <= ids
    assert None in ids  # the field-less row: all-NULL good, by contract
