"""r6 (late) scale probes for dedup_substrings.

1. Linear growth: N and 10N synthetic docs (~100 closed-form tokens
   each, 50k vocab -> random 20-gram collisions impossible), 10% of
   docs carrying a planted 30-token copy of their successor's middle.
   The 100 TB claim is that span volume and join work grow with
   PLANTED duplication (∝ N at fixed dup rate), never with corpus
   pairs (∝ N²): the probe asserts the span-count ratio lands near 10
   and wall time stays far from 100x.

2. Boilerplate quadratic hazard, measured: N docs all sharing one
   25-token footer -> the footer shingles collide in all N docs and
   the uncapped join must emit ~N²/2 pairs (the straggler shape Lee
   et al. cut by frequency).  ``max_occurrences=100`` drops the
   footer shingles in a map-side-combinable count pass; the probe
   asserts the capped run emits zero footer spans and beats the
   uncapped wall time.

Prints one JSON line per probe; paste results into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    from pyspark.sql import SparkSession, functions as F

    from pandance_spark.operators.dedup import dedup_substrings

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pdx_scale_probe_r06b")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def synth_docs(n):
        """~100 tokens/doc from a (doc_id, pos) closed form; docs with
        doc_id % 10 == 0 append tokens 30..59 of doc_id + 1 (a planted
        30-token duplicate span at fixed 10% rate)."""
        base = spark.range(n).withColumnRenamed("id", "doc_id")

        def toks(did, lo, hi):
            return F.transform(
                F.sequence(F.lit(lo), F.lit(hi)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(did * 1000 + i), F.lit(50000)).cast(
                        "string"
                    ),
                ),
            )

        own = toks(F.col("doc_id"), 1, 100)
        planted = F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(own, toks(F.col("doc_id") + 1, 30, 59)),
        ).otherwise(own)
        return base.select(
            "doc_id", F.array_join(planted, " ").alias("text")
        ).localCheckpoint(eager=True)

    results = {}
    for n in (20_000, 200_000):
        docs = synth_docs(n)
        t0 = time.time()
        spans = dedup_substrings(docs, "doc_id", "text", min_tokens=20)
        cnt = spans.count()
        dt = time.time() - t0
        results[n] = (cnt, dt)
        print(
            json.dumps(
                {
                    "probe": "substr_linear",
                    "docs": n,
                    "spans": cnt,
                    "sec": round(dt, 2),
                }
            )
        )
    r_spans = results[200_000][0] / max(results[20_000][0], 1)
    r_wall = results[200_000][1] / max(results[20_000][1], 1e-9)
    print(
        json.dumps(
            {
                "probe": "substr_linear_ratio",
                "span_ratio_10x_docs": round(r_spans, 2),
                "wall_ratio_10x_docs": round(r_wall, 2),
            }
        )
    )
    assert 8 <= r_spans <= 12, f"span growth not ∝ docs: {r_spans}"
    assert r_wall < 40, f"wall growth superlinear beyond plausible: {r_wall}"

    # probe 2: shared-footer quadratic hazard vs max_occurrences cap
    n = 3000
    footer = " ".join(f"f{i}" for i in range(25))
    docs = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.concat(
                F.lit("u"),
                F.col("doc_id").cast("string"),
                F.lit(" v"),
                F.col("doc_id").cast("string"),
                F.lit(" " + footer),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    uncapped = dedup_substrings(docs, "doc_id", "text", min_tokens=25).count()
    t_uncapped = time.time() - t0
    t0 = time.time()
    capped = dedup_substrings(
        docs, "doc_id", "text", min_tokens=25, max_occurrences=100
    ).count()
    t_capped = time.time() - t0
    print(
        json.dumps(
            {
                "probe": "substr_boilerplate_cap",
                "docs": n,
                "uncapped_pairs": uncapped,
                "uncapped_sec": round(t_uncapped, 2),
                "capped_pairs": capped,
                "capped_sec": round(t_capped, 2),
            }
        )
    )
    assert uncapped == n * (n - 1) // 2, uncapped
    assert capped == 0, capped
    assert t_capped < t_uncapped, (t_capped, t_uncapped)

    probe_contamination(spark)
    probe_zorder(spark)
    spark.stop()



def probe_contamination(spark):
    """200k-doc corpus vs 500-item benchmark: decontamination must be
    ONE corpus pass with the bench side broadcast — wall should sit
    near the corpus shingle-scan cost, and every planted item must be
    found."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F

    from pandance_spark.operators.dedup import contamination_spans

    n = 200_000
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(100)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("doc_id") * 1000 + i), F.lit(50000)).cast(
                "string"
            ),
        ),
    )
    corpus = base.select(
        "doc_id", F.array_join(toks, " ").alias("text")
    ).localCheckpoint(eager=True)
    bench = (
        corpus.filter(F.col("doc_id") % 400 == 0)
        .select(
            F.col("doc_id").alias("bid"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 21, 30), " "
            ).alias("btext"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = _time.time()
    spans = contamination_spans(
        corpus, "doc_id", "text", bench, "bid", "btext", min_tokens=13
    )
    cnt = spans.count()
    dt = _time.time() - t0
    plan = spans._jdf.queryExecution().executedPlan().toString()
    bcast = "BroadcastHashJoin" in plan
    print(
        _json.dumps(
            {
                "probe": "contamination_broadcast",
                "corpus_docs": n,
                "bench_items": 500,
                "spans": cnt,
                "sec": round(dt, 2),
                "bench_side_broadcast": bcast,
            }
        )
    )
    assert cnt == 500, cnt  # every planted item found, nothing else
    assert bcast, "bench side must broadcast"

def probe_zorder(spark):
    """Row-group statistics under Z-order vs single-column sort:
    avg (max-min)/(global span) per row group, both clustered columns.
    Small fractions => min/max pruning skips most groups for a
    selective predicate on that column."""
    import json as _json
    import shutil as _shutil

    from pyspark.sql import functions as F

    from pandance_spark.functions.layout import write_zordered
    from pandance_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    n = li.count()
    zp, op = "/tmp/pdx_zorder_probe", "/tmp/pdx_orderkey_probe"
    for d in (zp, op):
        _shutil.rmtree(d, ignore_errors=True)
    write_zordered(li, zp, ["l_orderkey", "l_partkey"], n_files=16, bits=10)
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(op)
    )
    import duckdb

    con = duckdb.connect()

    def frac(path, col):
        return con.execute(
            f"""
            SELECT avg((stats_max::BIGINT - stats_min::BIGINT) /
                       (SELECT max({col})*1.0 - min({col})
                        FROM '{path}/*.parquet'))
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = '{col}'
            """
        ).fetchone()[0]

    out = {}
    for layout, path in (("zorder", zp), ("orderkey_sort", op)):
        out[layout] = (frac(path, "l_orderkey"), frac(path, "l_partkey"))
        print(
            _json.dumps(
                {
                    "probe": "zorder_layout",
                    "rows": n,
                    "layout": layout,
                    "rowgroup_range_frac_orderkey": round(out[layout][0], 3),
                    "rowgroup_range_frac_partkey": round(out[layout][1], 3),
                }
            )
        )
    # z-order must make the SECOND column pruneable (frac < 0.5) while
    # the single-column sort leaves it full-width (~1.0)
    assert out["zorder"][1] < 0.5 < out["orderkey_sort"][1]
    for d in (zp, op):
        _shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
