"""Phase-timed per-query breakdown (guide §1: measure first).

For each query: time (a) Python DataFrame BUILD (py4j expression-tree
construction + analysis), (b) OPTIMIZE (optimizedPlan force), and
(c) EXECUTE (noop write).  Repeats REPS times, reports medians.

Usage: SPARK_GRAFT_BENCH_ONLY=a,b,c python scripts/phase_time_r11.py
       (no env = the full bench headline list)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("phase_time_r11")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    names = (
        [s.strip() for s in only.split(",") if s.strip()]
        if only
        else list(qs)
    )

    def _barrier():
        gc.collect()
        try:
            spark.catalog.clearCache()
            it = (
                spark.sparkContext._jsc.getPersistentRDDs().values().iterator()
            )
            while it.hasNext():
                it.next().unpersist(False)
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    warm_dir = SF_DIR.replace("sf0.1", "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR

    out = {}
    for name in names:
        if name not in qs:
            continue
        try:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        _barrier()
        builds, opts, execs = [], [], []
        try:
            for _ in range(REPS):
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                t1 = time.time()
                df._jdf.queryExecution().optimizedPlan()
                t2 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.time()
                builds.append(t1 - t0)
                opts.append(t2 - t1)
                execs.append(t3 - t2)
        except Exception as e:
            out[name] = {"err": repr(e)[:200]}
            continue
        out[name] = {
            "build": round(statistics.median(builds), 3),
            "optimize": round(statistics.median(opts), 3),
            "exec": round(statistics.median(execs), 3),
            "total": round(
                statistics.median(builds)
                + statistics.median(opts)
                + statistics.median(execs),
                3,
            ),
        }
        print(json.dumps({name: out[name]}), flush=True)

    path = os.environ.get(
        "SPARK_GRAFT_PHASE_OUT", "/tmp/phase_time_r11.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
