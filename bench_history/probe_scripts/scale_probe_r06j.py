"""Scale probe (r6, 10th batch): the Q21 correlated-subquery shape.

Claim measured: the hand-decorrelated EXISTS/NOT-EXISTS plan (compound
equi+inequality semi/anti joins on the order key) scales with the
LINEITEM table, not with orders², because every comparison happens
inside one order's line group after the equi-join shuffle — 10x lines
at held lines-per-order -> ~linear wall.

Run: python scripts/scale_probe_r06j.py
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
        .appName("scale_probe_r06j")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def synth(n_orders, lines_per_order=6, suppliers=1000):
        li = spark.range(n_orders * lines_per_order).select(
            (F.col("id") / lines_per_order).cast("long").alias("l_orderkey"),
            (F.xxhash64("id") % suppliers).alias("l_suppkey"),
            F.when((F.xxhash64("id", F.lit(7)) % 4) == 0, F.lit("R"))
            .otherwise(F.lit("N"))
            .alias("l_returnflag"),
        )
        return li.localCheckpoint()

    def q21(li):
        l1 = li.filter(F.col("l_returnflag") == "R").select(
            "l_orderkey", "l_suppkey"
        )
        l2 = li.select(
            F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
        )
        l3 = li.filter(F.col("l_returnflag") == "R").select(
            F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
        )
        return (
            l1.join(
                l2,
                (F.col("l_orderkey") == F.col("k2"))
                & (F.col("l_suppkey") != F.col("s2")),
                "left_semi",
            )
            .join(
                l3,
                (F.col("l_orderkey") == F.col("k3"))
                & (F.col("l_suppkey") != F.col("s3")),
                "left_anti",
            )
            .groupBy("l_suppkey")
            .agg(F.countDistinct("l_orderkey").alias("numwait"))
        )

    print("== Q21 shape: wall vs lineitem volume (held lines/order) ==")
    for n, label in ((100_000, "1x"), (1_000_000, "10x")):
        li = synth(n)
        t0 = time.time()
        rows = q21(li).count()
        print(f"  {label}: {n*6:>10,} lines / {n:,} orders -> "
              f"{rows:,} blamed suppliers in {time.time()-t0:.2f}s")

    spark.stop()


if __name__ == "__main__":
    main()
