"""Scale probe (r8, session 2): the seven new queries at 10x data.

- c4_filters / html_links / vocab_oov: map-only or broadcast+map —
  expect near-linear wall (fixed overhead dominates at these SFs).
- corpus_drift: the shuffle carries (feature, bin) keys ONLY — its
  post-aggregate row count must be IDENTICAL at 1x and 10x (the whole
  point of the design); wall should track the scan.
- ngram_novelty: shuffle equi-join on shingle strings — join input is
  distinct shingles, output one row per document; expect ~linear.
- embed_pc1: moment aggregates carry <= dim(dim+1)/2 rows per
  partition regardless of corpus size; the projection is map-only.
- orc_roundtrip: write+read round trip; scales with the projection.

Results go to SCALING.md (one row per query).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E

QS = [
    "c4_filters",
    "html_links",
    "vocab_oov",
    "corpus_drift",
    "ngram_novelty",
    "embed_pc1",
    "orc_roundtrip",
    "vocab_coverage",
    "robots_gate",
    "emit_packs",
    "page_meta",
    "interleave_sources",
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
        ts, rows = {}, {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
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
            rows[sf] = qs[name](spark, sf).count()
        a, b = ts["/root/testdata/sf0.01"], ts["/root/testdata/sf0.1"]
        print(
            f"{name}: sf0.01={a:.2f}s ({rows['/root/testdata/sf0.01']} rows) "
            f"sf0.1={b:.2f}s ({rows['/root/testdata/sf0.1']} rows) "
            f"ratio={b / max(a, 1e-9):.1f}x"
        )


if __name__ == "__main__":
    main()
