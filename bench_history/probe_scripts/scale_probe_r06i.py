"""Scale probe (r6, 9th batch): main-content extraction + card PII.

Claims measured:

1. `extract_main_text` is scan-bound: 10x documents -> ~linear wall
   (pure projection; the block lambdas are interpreted HOFs but run
   once per block after the struct-staging fix).

2. `find_card_numbers`/`redact_card_numbers` at REALISTIC candidate
   density (~2% of documents contain any digit run) cost ~the scan;
   the interpreted Luhn folds only execute on rows with runs — the
   regime the operator is built for (contrast: PLANS.md's r06y
   adjudication shows what a candidate-in-every-row fixture does).

Run: python scripts/scale_probe_r06i.py
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
        .appName("scale_probe_r06i")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark.functions.text import (
        extract_main_text,
        find_card_numbers,
        redact_card_numbers,
    )

    prose = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the field of long sentences "
    )

    def synth_pages(n):
        return spark.range(n).select(
            F.col("id"),
            F.concat(
                F.lit('<div class="nav"><a href="/">Home</a> <a href="/a">About</a></div><p>'),
                F.lit(prose * 4),
                F.col("id").cast("string"),
                F.lit('</p><div class="rel"><a href="/x">More stories here</a>'
                      '<a href="/y">Subscribe to newsletter</a></div>'),
            ).alias("html"),
        )

    print("== extract_main_text: wall vs document count ==")
    for n, label in ((100_000, "1x"), (1_000_000, "10x")):
        pages = synth_pages(n).localCheckpoint()
        t0 = time.time()
        out = pages.select(extract_main_text(F.col("html")).alias("t"))
        rows = out.filter(F.length("t") > 100).count()
        print(f"  {label}: {n:>9,} pages -> {rows:,} with main text in "
              f"{time.time()-t0:.2f}s")

    print("== card PII at ~2% candidate density ==")

    def synth_docs(n):
        # 2% of docs embed a digit run (half of those a valid PAN)
        pan = "4111111111111111"
        return spark.range(n).select(
            F.col("id"),
            F.when(
                F.col("id") % 100 == 0,
                F.concat(F.lit(prose), F.lit("pay with " + pan + " now")),
            )
            .when(
                F.col("id") % 100 == 1,
                F.concat(F.lit(prose), F.lit("order 1234567890123456 ref")),
            )
            .otherwise(F.lit(prose * 2))
            .alias("text"),
        )

    for n, label in ((200_000, "1x"), (2_000_000, "10x")):
        docs = synth_docs(n).localCheckpoint()
        t0 = time.time()
        hits = docs.select(
            F.size(find_card_numbers(F.col("text"))).alias("k"),
            # consume the redacted text too, or column pruning removes
            # it and the probe measures only detection (review finding)
            F.length(redact_card_numbers(F.col("text"))).alias("rl"),
        )
        found = hits.filter("k > 0 AND rl > 0").count()
        wall = time.time() - t0
        print(f"  {label}: {n:>9,} docs -> {found:,} docs with a valid PAN "
              f"in {wall:.2f}s (expected {n // 100:,}; Luhn folds ran on "
              f"~2% of rows)")

    spark.stop()


if __name__ == "__main__":
    main()
