"""r11 adjudication of minhash_eval / minhash_eval_sampled (VERDICT r10
What's-wrong #1): the driver bench read minhash_eval 1.391 s (r9) ->
2.956 s (r10) while the round's clean local bench read the SAMPLED mode
(5.221 s) as MORE expensive than the full audit (5.164 s) — three
numbers that cannot all describe the same plans.

Same protocol as the r10 simhash adjudication (PLANS.md "r10:
adjudication"): fresh session, idle box, reps, PHASE timing —

  build    driver-side query construction (zero jobs)
  truth    exact ngram_jaccard_join count alone
  cands    minhash_candidates count alone
  full     the whole minhash_eval report (noop sink)
  sampled  minhash_eval(truth_sample_frac=0.5) (noop sink)

and BOTH orders (full-first vs sampled-first) to expose first-touch
codegen/shuffle-file effects the bench's per-query warmup should have
absorbed but may not have for the sampled variant (its plan shape —
the extra stratified-filter ancestor — differs from the warm pass shape
only at sf0.001).

Usage: python scripts/adjudicate_minhash_r11.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("adjudicate_minhash_r11")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pandance_spark.operators.dedup import (  # noqa: E402
    minhash_candidates,
    minhash_eval,
    ngram_jaccard_join,
)


def aug_df():
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.select("doc_id", "text")
    dropped = F.array_join(
        F.filter(F.split(F.col("text"), " "), lambda x, i: i % 9 != 0), " "
    )
    variants = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), dropped.alias("text")
    )
    return docs.unionAll(variants)


def consume(df):
    df.write.format("noop").mode("overwrite").save()


def barrier():
    import gc

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


def timed(fn, reps=REPS, label=""):
    out = []
    for _ in range(reps):
        barrier()
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    med = round(statistics.median(out), 3)
    print(f"{label:28s} med={med:7.3f}  reps={out}", flush=True)
    return med


def build_full():
    return minhash_eval(aug_df(), "doc_id", "text", threshold=0.6,
                        portable=True)


def build_sampled():
    return minhash_eval(aug_df(), "doc_id", "text", threshold=0.6,
                        portable=True, truth_sample_frac=0.5)


# --- warm pass (exactly what bench.py does: sf0.001 equivalent) -------
warm_dir = SF_DIR.replace("sf0.1", "sf0.001")
if os.path.isdir(warm_dir):
    real_sf = SF_DIR
    SF_DIR = warm_dir
    build_full().count()
    build_sampled().count()
    SF_DIR = real_sf

print(f"== isolated phase-timed re-measure, sf_dir={SF_DIR} reps={REPS}")

# --- phase: driver-side build cost (zero jobs) ------------------------
timed(lambda: build_full().schema, label="build full (no jobs)")
timed(lambda: build_sampled().schema, label="build sampled (no jobs)")

# --- phase: components in isolation -----------------------------------
aug = aug_df()
timed(lambda: aug.count(), label="fixture count")
timed(
    lambda: ngram_jaccard_join(
        aug_df(), "doc_id", "text", shingle_n=3, threshold=0.6
    ).count(),
    label="truth (exact jaccard)",
)
timed(
    lambda: minhash_candidates(
        aug_df(), "doc_id", "text", 64, 16, 3, 42, portable=True
    ).count(),
    label="cands (LSH)",
)
half = None


def sampled_truth():
    from pandance_spark.operators.dedup import _stratified_doc_sample

    s = _stratified_doc_sample(aug_df(), "doc_id", "text", 0.5, 42, True)
    return ngram_jaccard_join(
        s, "doc_id", "text", shingle_n=3, threshold=0.6
    ).count()


timed(sampled_truth, label="truth on half-sample")

# --- phase: end-to-end, order A (full first) --------------------------
print("-- order A: full first")
a_full = timed(lambda: consume(build_full()), label="minhash_eval")
a_samp = timed(lambda: consume(build_sampled()), label="minhash_eval_sampled")

# --- phase: end-to-end, order B (sampled first) -----------------------
print("-- order B: sampled first")
b_samp = timed(lambda: consume(build_sampled()), label="minhash_eval_sampled")
b_full = timed(lambda: consume(build_full()), label="minhash_eval")

print(
    f"SUMMARY fullA={a_full} sampledA={a_samp} "
    f"sampledB={b_samp} fullB={b_full} "
    f"saving={round((min(a_full, b_full) - min(a_samp, b_samp)) / max(min(a_full, b_full), 1e-9), 3)}"
)
spark.stop()
