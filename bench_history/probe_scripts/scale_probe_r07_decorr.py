"""r7 probe: window-form decorrelation at 10x fact volume.

Claim: the q17-shape (per-group scalar via a window aggregate over the
group key) costs ONE scan + ONE shuffle of the fact table, so wall
grows ~linearly with volume — an aggregate-join-back plan would pay a
second scan, and a naive correlated re-aggregation would be
group-quadratic.

Probe: replicate sf0.01 lineitem 10x with distinct order keys (same
part-key profile, so per-part group sizes grow 10x too) and run the
q17 filter+rollup at 1x and 10x.

Usage: python scripts/scale_probe_r07_decorr.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    from pyspark.sql import SparkSession, Window, functions as F

    from pandance_spark.sources import load_table

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("decorr_scale_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")

    def at(mult: int):
        f = li
        if mult > 1:
            f = li.crossJoin(
                spark.range(mult).withColumnRenamed("id", "rep")
            ).withColumn(
                "l_orderkey",
                F.col("l_orderkey") * mult + F.col("rep"),
            ).drop("rep")
        return f.repartition(32).localCheckpoint(eager=True)

    for mult in (1, 10):
        fact = at(mult)
        n = fact.count()
        w = Window.partitionBy("l_partkey")
        t0 = time.time()
        out = (
            fact.withColumn("__gate", F.avg("l_quantity").over(w) * 0.5)
            .filter(F.col("l_quantity") < F.col("__gate"))
            .join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(
                F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
                F.count(F.lit(1)).alias("n_lines"),
            )
        )
        rows = out.count()
        dt = time.time() - t0
        print(f"mult={mult}: lines={n} brands={rows} wall={dt:.2f}s")


if __name__ == "__main__":
    main()
