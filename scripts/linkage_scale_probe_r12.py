"""Second-decade probe for the r12-reshaped edit-distance machinery
(the @sf1 fixture carries no customer table, so the linkage probe
builds its own TPC-H-shaped register at two sizes).

Names replay the real fixture's worst case — the shared
"Customer#000000XXX" stencil where every string shares every
alphabetic gram — and the register is the declared query's mutation
(bucket 0 drops a char, bucket 3 swaps '#', bucket 6 verbatim).
Growth is pure corpus growth: more names, same per-name structure, so
the candidate space per gram collision grows ~quadratically — the
probe grades wall against max(input growth, match growth).

Usage: python scripts/linkage_scale_probe_r12.py [--sizes 10000,40000]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,40000")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from pandance_spark.operators.dedup import record_linkage

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n in [int(x) for x in args.sizes.split(",")]:
        cust = (
            spark.range(n)
            .select(
                F.col("id").alias("c_custkey"),
                F.concat(
                    F.lit("Customer#"),
                    F.lpad(F.col("id").cast("string"), 9, "0"),
                ).alias("c_name"),
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        mutated = (
            F.when(
                F.col("c_custkey") % 9 == 0,
                F.concat(
                    F.substring("c_name", 1, 9),
                    F.expr("substring(c_name, 11)"),
                ),
            )
            .when(
                F.col("c_custkey") % 9 == 3,
                F.regexp_replace(F.col("c_name"), "#", "@"),
            )
            .otherwise(F.col("c_name"))
        )
        right = cust.select(
            F.col("c_custkey").alias("rid"), mutated.alias("rname")
        )
        best, rows = None, None
        for _ in range(args.reps):
            t0 = time.time()
            rows = record_linkage(
                cust, right, "c_custkey", "c_name", "rid", "rname",
                max_dist=1,
            ).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        results[n] = (best, rows)
        print(f"n={n}: wall {best:.2f}s matches {rows}", flush=True)

    sizes = sorted(results)
    for a, b in zip(sizes, sizes[1:]):
        wa, ra = results[a]
        wb, rb = results[b]
        print(
            f"decade {a}->{b} (input x{b/a:.1f}): wall x{wb/wa:.2f}, "
            f"matches x{rb/ra:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
