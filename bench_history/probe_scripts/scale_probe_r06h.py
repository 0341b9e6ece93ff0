"""Scale probe (r6, 8th batch): funnel / cohort / CDC apply / gap fill.

Claims measured:

1. `funnel_steps` + `cohort_retention` cost one user-key shuffle: 10x
   events (same user count → 10x events per user, then 10x users at
   held events-per-user) -> ~linear wall, and a single pathological
   user costs their own event list, not the corpus.

2. `apply_changes` with a fixed-size feed over a 10x snapshot: wall
   tracks the snapshot SCAN (anti-join + union are snapshot-pass
   work), and the feed side's window never touches the snapshot.

3. `fill_gaps` cost after the first reduction is GRID-sized: 10x raw
   observations into the same horizon -> near-flat tail (the grid
   and LOCF window don't grow with event volume).

Run: python scripts/scale_probe_r06h.py
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
        .appName("scale_probe_r06h")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark.functions.analytics import (
        cohort_retention,
        funnel_steps,
        funnel_summary,
    )
    from pandance_spark.operators.merge import apply_changes
    from pandance_spark.operators.rollup import fill_gaps

    STEPS = ["view", "click", "purchase"]

    def synth_events(n, users):
        # deterministic step/ts pattern, ~n/users events per user
        return spark.range(n).select(
            (F.col("id") % users).alias("user_id"),
            F.timestamp_seconds(F.col("id") % 2_592_000).alias("ts"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase"),
                        F.lit("other")),
                ((F.xxhash64(F.col("id")) % 4 + 4) % 4 + 1).cast("int"),
            ).alias("step"),
        )

    print("== funnel_steps + summary: wall vs event volume ==")
    for n, users, label in ((1_000_000, 50_000, "1x"),
                            (10_000_000, 500_000, "10x users"),):
        ev = synth_events(n, users).localCheckpoint()
        t0 = time.time()
        s = funnel_summary(
            funnel_steps(ev, "user_id", "ts", "step", STEPS), STEPS
        ).collect()
        wall = time.time() - t0
        print(f"  {label}: {n:>11,} events / {users:,} users -> "
              f"{[(r['step'], r['users']) for r in s]} in {wall:.2f}s")

    print("== funnel: hot-user atom (one user with 1M events) ==")
    hot = synth_events(1_000_000, 50_000).withColumn(
        "user_id", F.when(F.col("user_id") < 10_000, F.lit(0)).otherwise(F.col("user_id"))
    ).localCheckpoint()
    t0 = time.time()
    funnel_summary(funnel_steps(hot, "user_id", "ts", "step", STEPS), STEPS).collect()
    print(f"  1M events, hottest user holds ~20% -> {time.time()-t0:.2f}s "
          f"(the fold is linear in the user's own list)")

    print("== cohort_retention: wall vs event volume ==")
    for n, users, label in ((1_000_000, 50_000, "1x"),
                            (10_000_000, 500_000, "10x")):
        ev = synth_events(n, users).localCheckpoint()
        t0 = time.time()
        rows = cohort_retention(ev, "user_id", "ts", 604800).count()
        print(f"  {label}: {n:>11,} events -> {rows} cells in "
              f"{time.time()-t0:.2f}s")

    print("== apply_changes: fixed 100k feed vs snapshot size ==")
    feed = (
        spark.range(100_000)
        .select(
            (F.col("id") * 37).alias("k"),
            F.xxhash64("id").cast("double").alias("v"),
            F.when(F.col("id") % 9 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            (F.col("id") % 3 + 1).cast("int").alias("ver"),
        )
        .localCheckpoint()
    )
    for n, label in ((2_000_000, "1x"), (20_000_000, "10x")):
        snap = spark.range(n).select(
            F.col("id").alias("k"), F.rand(7).alias("v")
        ).localCheckpoint()
        t0 = time.time()
        out_n = apply_changes(snap, feed, ["k"], "ver").count()
        print(f"  {label}: snapshot {n:>11,} rows + 100k changes -> "
              f"{out_n:,} rows in {time.time()-t0:.2f}s")

    print("== fill_gaps: wall vs raw observations at a FIXED horizon ==")
    for n, label in ((1_000_000, "1x"), (10_000_000, "10x")):
        ev = spark.range(n).select(
            F.timestamp_seconds((F.xxhash64("id") % 2_592_000 + 2_592_000) % 2_592_000).alias("ts"),
            F.concat(F.lit("k"), (F.col("id") % 20).cast("string")).alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        ).localCheckpoint()
        t0 = time.time()
        rows = fill_gaps(ev, "ts", 900, ["k"], "v").count()
        print(f"  {label}: {n:>11,} observations -> {rows:,} grid rows in "
              f"{time.time()-t0:.2f}s (grid bounded by horizon/width x keys)")

    spark.stop()


if __name__ == "__main__":
    main()
