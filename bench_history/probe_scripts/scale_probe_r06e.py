"""Scale probes (r6, 5th batch): DSIR selection, tf-idf keywords,
weighted sampling, filter funnel.

Claims measured here, at two scales (N and 10N):

1. dsir_select: the weight table stays <= buckets rows no matter the
   corpus size, and wall grows sub-linearly in rows (the work is two
   map-side-combined bucket counts + one per-doc score agg).
2. keywords_tfidf: shuffle volume is the distinct (doc, term) table —
   measured directly — and grows linearly with docs at fixed
   vocabulary/doc shape, never with raw token count x vocabulary.
3. weighted_sample: top-k over 10x the rows is a flat
   TakeOrderedAndProject scan — no global sort, wall ~scan-bound.
4. filter_funnel: ONE scan regardless of rule count; wall at 10x rows
   grows ~linearly and the label counts are exact at both scales.

Run: python scripts/scale_probe_r06e.py  (local[32], synthetic data)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def synth_docs(spark, n):
    """Deterministic ~20-token docs over a 30-word vocab; 30% get an
    'english-marker' suffix so the DSIR target has signal to chase."""
    from pyspark.sql import functions as F

    words = [f"w{i}" for i in range(30)]
    vocab = F.array(*[F.lit(w) for w in words])
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda i: F.element_at(
            vocab,
            ((F.xxhash64(F.col("id"), i) % 30 + 30) % 30 + 1).cast("int"),
        ),
    )
    marker = F.when(
        F.col("id") % 10 < 3, F.lit(" the of and is this")
    ).otherwise(F.lit(""))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.array_join(toks, " "), marker).alias("text"),
        (F.col("id") % 10 < 3).alias("is_target_like"),
        (F.length(F.array_join(toks, " ")) + F.length(marker)).alias("n_chars"),
    )


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale_probe_r06e")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark.functions.dsir import (
        dsir_weights,
        hashed_feature_counts,
        dsir_select,
    )
    from pandance_spark.functions.profile import filter_funnel
    from pandance_spark.functions.ranking import keywords_tfidf
    from pandance_spark.functions.split import weighted_sample
    from pandance_spark.functions.text import tokenize

    B = 10_000

    print("== dsir_select ==")
    for n in (200_000, 2_000_000):
        docs = synth_docs(spark, n).localCheckpoint()
        target = docs.filter(F.col("is_target_like")).limit(5_000).localCheckpoint()
        w_rows = dsir_weights(
            hashed_feature_counts(target, "text", B),
            hashed_feature_counts(docs, "text", B),
            B,
        ).count()
        for portable in (True, False):
            t0 = time.time()
            picked = dsir_select(
                docs, target, "text", "doc_id", k=10_000, buckets=B,
                portable=portable,
            )
            hits = picked.filter(F.col("is_target_like")).count()
            dt = time.time() - t0
            print(
                f"  n={n} portable={portable}: weight_table={w_rows} rows"
                f" (<= {B}), top-10k target-like hits={hits}, wall={dt:.2f}s"
            )

    print("== keywords_tfidf ==")
    for n in (100_000, 1_000_000):
        docs = synth_docs(spark, n).localCheckpoint()
        pairs = (
            docs.select(
                F.col("doc_id"), F.explode(tokenize(F.col("text"))).alias("t")
            )
            .groupBy("doc_id", "t")
            .count()
            .count()
        )
        t0 = time.time()
        out = keywords_tfidf(docs, "doc_id", "text", k=3)
        cnt = out.count()
        dt = time.time() - t0
        print(f"  n={n}: shuffle=(doc,term) rows {pairs}, topk rows={cnt}, wall={dt:.2f}s")

    print("== weighted_sample ==")
    for n in (1_000_000, 10_000_000):
        df = spark.range(n).select(
            F.col("id"), (F.col("id") % 100 + 1).cast("double").alias("w")
        ).localCheckpoint()
        t0 = time.time()
        got = weighted_sample(df, "id", F.col("w"), k=1_000)
        mean_w = got.agg(F.avg("w")).collect()[0][0]
        dt = time.time() - t0
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        print(
            f"  n={n}: k=1000 sample mean weight={mean_w:.1f} "
            f"(uniform would be ~50.5), wall={dt:.2f}s, TakeOrderedAndProject"
        )

    print("== filter_funnel ==")
    for n in (1_000_000, 10_000_000):
        docs = synth_docs(spark, n).localCheckpoint()
        rules = [
            ("too_short", F.col("n_chars") >= 60),
            ("not_target", F.col("is_target_like")),
            ("no_w7", F.col("text").contains("w7")),
        ]
        t0 = time.time()
        rows = filter_funnel(docs, rules).collect()
        dt = time.time() - t0
        tot = rows[0]["n_in"]
        kept = rows[-1]["n_out"]
        assert tot == n
        print(f"  n={n}: n_in={tot} kept={kept}, wall={dt:.2f}s (ONE scan)")

    spark.stop()


if __name__ == "__main__":
    main()
