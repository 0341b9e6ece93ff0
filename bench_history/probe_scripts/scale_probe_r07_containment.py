"""r7 probe: containment_join candidate growth.

Claim: candidates are generated only by query-PREFIX collisions with
the corpus shingle index (rarest-first order), so candidate volume
grows with true-match density — never |Q| x |C|.

Probe: synthesize a corpus of N documents from sf0.01 text atoms and a
query set of N/10 half-prefix quotes; measure candidate pairs /
verified pairs / wall at 1x and 10x corpus size.  A quadratic
candidate stage would grow 100x in pairs (queries scale with corpus
here); collision-proportional growth tracks the ~10x match count.

Usage: python scripts/scale_probe_r07_containment.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    from pyspark.sql import SparkSession, functions as F

    from pandance_spark.operators.dedup import containment_join
    from pandance_spark.sources import load_table

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("containment_scale_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def corpus_at(mult: int):
        # replicate with distinct ids and per-copy salt tokens so copies
        # are NOT exact dups (realistic near-miss corpus, same shingle
        # frequency profile)
        c = base
        if mult > 1:
            c = base.crossJoin(
                spark.range(mult).withColumnRenamed("id", "rep")
            ).select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.col("text"),
                    F.concat(F.lit("salt"), F.col("rep")),
                ).alias("text"),
            )
        return c.repartition(32).localCheckpoint(eager=True)

    for mult in (1, 10):
        corpus = corpus_at(mult)
        n_docs = corpus.count()
        quotes = corpus.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("quote_id"),
            F.expr(
                "substring(text, 1, cast(floor(length(text) / 2.0) as int))"
            ).alias("qtext"),
        )
        t0 = time.time()
        out = containment_join(
            quotes, corpus, "quote_id", "qtext", "doc_id", "text",
            shingle_n=3, threshold=0.8,
        )
        n_pairs = out.count()
        dt = time.time() - t0
        print(
            f"mult={mult}: corpus={n_docs} queries={n_docs//10} "
            f"verified_pairs={n_pairs} wall={dt:.2f}s"
        )


if __name__ == "__main__":
    main()
