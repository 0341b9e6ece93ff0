"""Scale probe (r6, 6th batch): hypertable rollup maintenance.

Claim measured: the incremental merge's cost tracks the BATCH (and the
partitions it touches), not the size of the accumulated rollup or the
raw history — the property that keeps a continuous aggregate over a
100 TB event stream maintainable.  Two rollup sizes (1x and 10x
history), same batch: near-flat merge wall, identical per-batch
result; plus touched-partition locality measured directly (the merge
reads back only partitions the batch hashes into).

Run: python scripts/scale_probe_r06f.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale_probe_r06f")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark.streaming import _rollup_batch_handler

    tmp = tempfile.mkdtemp(prefix="pdx_probe_roll_")
    N_BUCKETS = 64

    def synth(n, t0):
        # one event per second from t0, 20 keys
        return spark.range(n).select(
            F.timestamp_seconds(F.lit(t0) + F.col("id")).alias("ts"),
            F.concat(F.lit("k"), (F.col("id") % 20).cast("string")).alias("k"),
            (F.col("id") % 100).cast("double").alias("v"),
        )

    print("== rollup merge cost vs accumulated history ==")
    for hist_n, label in ((2_000_000, "1x"), (20_000_000, "10x")):
        tgt = os.path.join(tmp, f"roll_{label}")
        h = _rollup_batch_handler(tgt, "ts", 3600, ["k"], "v", N_BUCKETS)
        # history: one big founding batch
        h(synth(hist_n, 0), 0)
        roll_rows = spark.read.parquet(tgt).count()
        # the maintained batch: one hour of fresh events AFTER history
        batch = synth(3_600, hist_n + 10_000_000).localCheckpoint()
        t0 = time.time()
        h(batch, 1)
        dt = time.time() - t0
        after = spark.read.parquet(tgt)
        touched = (
            after.filter(F.col("__last_bid") == 1)
            .select("__bucket").distinct().count()
        )
        print(
            f"  history={hist_n} ({label}): rollup={roll_rows} rows, "
            f"1h-batch merge wall={dt:.2f}s, touched "
            f"{touched}/{N_BUCKETS} partitions"
        )

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
