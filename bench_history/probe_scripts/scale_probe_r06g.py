"""Scale probe (r6, 7th batch): histogram rollup partials + keep_best.

Claims measured:

1. `build_rollup_hist` cost is the scan (map-side-combined conditional
   counts): 10x events -> ~10x build wall at CONSTANT shuffle volume
   (partials per (bucket, key) per input partition, never raw events),
   and `merge_rollup_hist` over two already-built partial tables stays
   FLAT when the underlying event history grows 10x — the property
   that keeps an incremental p95 dashboard maintainable at 100 TB.

2. `keep_best` is one thin join + ONE window shuffle on cluster_id:
   10x docs at a held cluster-size distribution -> ~linear wall; a
   single pathological 200k-row cluster costs what the dup group
   costs, it does not serialize the rest of the corpus (measured as
   the hot-cluster atom's marginal wall).

Run: python scripts/scale_probe_r06g.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale_probe_r06g")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark.operators.cluster import keep_best
    from pandance_spark.operators.rollup import (
        build_rollup_hist,
        merge_rollup_hist,
        quantile_from_hist,
    )

    bounds = [10.0, 20.0, 40.0, 80.0]

    def synth_ev(n):
        # one event per second across n seconds, 20 keys, hourly buckets
        return spark.range(n).select(
            F.timestamp_seconds(F.col("id")).alias("ts"),
            F.concat(F.lit("k"), (F.col("id") % 20).cast("string")).alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )

    print("== build_rollup_hist: wall vs event count ==")
    walls = {}
    for n, label in ((2_000_000, "1x"), (20_000_000, "10x")):
        ev = synth_ev(n)
        t0 = time.time()
        h = build_rollup_hist(ev, "ts", 3600, ["k"], "v", bounds)
        rows = h.count()
        walls[label] = time.time() - t0
        print(f"  {label}: {n:>10,} events -> {rows:,} partial rows "
              f"in {walls[label]:.2f}s")
    print(f"  build wall ratio 10x/1x = {walls['10x'] / walls['1x']:.2f} "
          f"(scan-bound; <10 means combine dominates)")

    print("== merge_rollup_hist: wall vs accumulated history ==")
    for n, label in ((2_000_000, "1x"), (20_000_000, "10x")):
        ev = synth_ev(n)
        old = build_rollup_hist(
            ev.filter(F.col("v") < 50), "ts", 3600, ["k"], "v", bounds
        ).localCheckpoint()
        new = build_rollup_hist(
            ev.filter(F.col("v") >= 50), "ts", 3600, ["k"], "v", bounds
        ).localCheckpoint()
        t0 = time.time()
        m = merge_rollup_hist(old, new)
        q = quantile_from_hist(m, 0.95, bounds)
        rows = q.count()
        wall = time.time() - t0
        print(f"  {label}: merge+p95 over {rows:,} groups in {wall:.2f}s "
              f"(aggregate-sized, history never re-read)")

    print("== keep_best: wall vs corpus size, held cluster distribution ==")

    def synth_docs(n):
        # 2% of docs share a cluster with one sibling; rest singletons
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.xxhash64(F.col("id")) % 1000 + 1000).alias("q"),
        )
        clusters = base.select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 100 < 2), (F.col("doc_id") / 2).cast("long") * 2
            ).otherwise(F.col("doc_id")).alias("cluster_id"),
        )
        return base, clusters

    kwalls = {}
    for n, label in ((200_000, "1x"), (2_000_000, "10x")):
        docs, clusters = synth_docs(n)
        docs = docs.localCheckpoint(); clusters = clusters.localCheckpoint()
        t0 = time.time()
        out = keep_best(docs, clusters, "doc_id", F.col("q"))
        kept = out.filter("is_best = 1").count()
        kwalls[label] = time.time() - t0
        print(f"  {label}: {n:>9,} docs -> {kept:,} keepers in {kwalls[label]:.2f}s")
    print(f"  keep_best wall ratio 10x/1x = {kwalls['10x'] / kwalls['1x']:.2f}")

    print("== keep_best: hot-cluster atom (one 200k-row cluster) ==")
    n = 2_000_000
    docs, _ = synth_docs(n)
    hot = docs.select(
        "doc_id",
        F.when(F.col("doc_id") < 200_000, F.lit(0))
        .otherwise(F.col("doc_id")).alias("cluster_id"),
    )
    docs = docs.localCheckpoint(); hot = hot.localCheckpoint()
    t0 = time.time()
    kept = keep_best(docs, hot, "doc_id", F.col("q")).filter("is_best = 1").count()
    wall = time.time() - t0
    print(f"  2,000,000 docs with a 200k-row cluster -> {kept:,} keepers "
          f"in {wall:.2f}s (vs uniform {kwalls['10x']:.2f}s — the atom costs "
          f"the dup group, not the corpus)")

    spark.stop()


if __name__ == "__main__":
    main()
