"""One-more-order-of-magnitude scale probes (r4 verdict item 8).

SCALING.md's evidence topped out at sf0.1 / the 100k x 100k workload
F x10.  This probe pushes the core band joins one further order of
magnitude, in-memory (no testdata writes), with output held constant
or bounded so the measurement isolates INPUT scaling:

1. fuzzy x100: 1M x 1M values, tol scaled down 100x so the expected
   match count equals the x10 workload's (~10.7M rows).  A band join
   whose cost is O(input + output) should grow ~10x vs x10's wall at
   100x the pairs; a nested loop would grow 100x.
2. fuzzy skew atom: 1M-row left where 50% of values are ONE atom
   (all land in one band bucket), right side small.  Checks the
   skewed bucket neither fails nor serializes the stage (AQE skew
   split / small-side broadcast), and that the plan stays the banded
   equi-join.
3. string-cut band join at 10x: 150k x 150k adversarial string keys
   (divergent first char, long constant middle — the r4 watch-item
   shape) through ineq_join band strategy with a bounded predicate
   window; reports the sampled cut count so the no-collapse property
   is measured, not assumed.

Prints one JSON line per probe; paste results into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def consume(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pdx_scale_probe")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark import fuzzy_join, ineq_join

    results = {}

    # ---- 1. fuzzy x100, constant output ------------------------------
    # deterministic standard normals via Box-Muller over two
    # xxhash-derived uniforms — real N(mean, 1) tails (an Irwin-Hall
    # sum would span only +-k/2 and the two sides would never overlap),
    # generated distributed, no driver materialization at 1M rows.
    def pseudo_normal(df, mean, salt):
        u1 = (
            F.pmod(F.xxhash64(F.col("id") + F.lit(salt * 2)), F.lit(10**9))
            + F.lit(1.0)
        ) / F.lit(10**9.0 + 1.0)
        u2 = (
            F.pmod(F.xxhash64(F.col("id") + F.lit(salt * 2 + 1)), F.lit(10**9))
            / F.lit(10**9.0)
        )
        z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * 3.141592653589793) * u2)
        return df.select(F.col("id").alias("idx"), (z + F.lit(mean)).alias("val"))

    n = 1_000_000
    a = pseudo_normal(spark.range(n), -2.0, 1).localCheckpoint(eager=True)
    b = pseudo_normal(spark.range(n), 2.0, 2).localCheckpoint(eager=True)
    t0 = time.time()
    out = fuzzy_join(a, b, on="val", tol=0.001, strategy="band")
    consume(out)
    wall = time.time() - t0
    n_out = out.count()  # untimed; re-executes the join just for the count
    results["fuzzy_x100_1m_x_1m"] = {
        "wall_sec": round(wall, 2),
        "rows_out": n_out,
        "note": "tol scaled 100x down -> output comparable to workload_f_x10",
    }
    print(json.dumps({"probe": "fuzzy_x100_1m_x_1m", **results["fuzzy_x100_1m_x_1m"]}))

    # ---- 2. fuzzy skew atom ------------------------------------------
    # 50% of the 1M left values are EXACTLY -2.0 -> one band bucket
    # holds 500k rows.  Right is 2k uniform over [-3, -1].
    atom = spark.range(n).select(
        F.col("id").alias("idx"),
        F.when(F.col("id") % 2 == 0, F.lit(-2.0)).otherwise(
            (F.pmod(F.xxhash64("id"), F.lit(10**9)) / F.lit(10**9.0)) * 2.0 - 3.0
        ).alias("val"),
    ).localCheckpoint(eager=True)
    small = spark.range(2000).select(
        F.col("id").alias("idx"),
        ((F.col("id") / F.lit(1000.0)) - F.lit(3.0)).alias("val"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    out = fuzzy_join(atom, small, on="val", tol=0.001, strategy="band")
    consume(out)
    wall = time.time() - t0
    results["fuzzy_skew_atom_500k_one_bucket"] = {
        "wall_sec": round(wall, 2),
        "rows_out": out.count(),
        "note": "half the left side in ONE band bucket; must not serialize",
    }
    print(json.dumps({"probe": "fuzzy_skew_atom_500k_one_bucket",
                      **results["fuzzy_skew_atom_500k_one_bucket"]}))

    # ---- 3. adversarial string band join at 10x ----------------------
    from pandance_spark.operators.ineq import _string_cuts

    mid = "X" * 40
    m = 150_000
    mk = (
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("a_")).otherwise(F.lit("b_")),
            F.lit(mid),
            F.lpad((F.col("id") / 2).cast("long").cast("string"), 9, "0"),
        )
    )
    sl = spark.range(m).select(mk.alias("s")).localCheckpoint(eager=True)
    sr = spark.range(m).select(mk.alias("s")).localCheckpoint(eager=True)
    cuts = _string_cuts(sr, "s", 32)
    # bounded output: s_x < s_y but only counting pairs where the left
    # key is in the top slice — keeps rows_out ~ m, not m^2/2
    top = sl.filter(F.col("s") >= F.lit("b_" + mid + "0000749"))
    t0 = time.time()
    out = ineq_join(top, sr, how="<", on="s", strategy="band", num_bands=32)
    consume(out)
    wall = time.time() - t0
    results["ineq_strings_adversarial_150k"] = {
        "wall_sec": round(wall, 2),
        "rows_out": out.count(),
        "distinct_cuts": len(cuts) if cuts else 0,
        "note": "r4 watch-item key shape at 10x the driver-query scale",
    }
    print(json.dumps({"probe": "ineq_strings_adversarial_150k",
                      **results["ineq_strings_adversarial_150k"]}))


if __name__ == "__main__":
    main()
