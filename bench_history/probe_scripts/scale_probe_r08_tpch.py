"""Scale probe (r8): the TPC-H completion suite at 10x facts.

Times q7/q8/q9/q10/q12/q19 at sf0.01 vs sf0.1 (lineitem/orders grow
10x; documents does not, so only the fact-join queries are probed).
Evidence target: near-linear growth — the plans are scan+BHJ/SMJ with
pushed filters, so a super-linear jump would indicate a join strategy
flipping to something quadratic.  Results are appended to SCALING.md
by hand (one row per query: t(sf0.01), t(sf0.1), ratio).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E

QS = [
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_lines",
    "q19_disjunctive_revenue",
]


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for name in QS:
        ts = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            # warm once (codegen), then time the median of 3
            qs[name](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            reps = []
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(time.time() - t0)
            ts[sf] = sorted(reps)[1]
        r = ts["/root/testdata/sf0.1"] / max(ts["/root/testdata/sf0.01"], 1e-9)
        print(
            f"{name}: sf0.01={ts['/root/testdata/sf0.01']:.2f}s "
            f"sf0.1={ts['/root/testdata/sf0.1']:.2f}s ratio={r:.1f}x"
        )


if __name__ == "__main__":
    main()
