"""r9 scaling probe: wall-clock of the 18 new queries at sf0.01 vs
sf0.1 (10x events, 10x documents, 4x embeddings) on a quiet box.

What "good" looks like per query class:
- map-only text panels (char_entropy, readability, sft_render, ...):
  ~linear in input rows;
- sketch builds (cms_heavy): input-linear scan, sketch-sized shuffle;
- kmeans/semdedup: linear assignment; semdedup pair stage grows with
  per-cluster density (planted dups grow linearly);
- triangle_count: the 60-vertex derived graph SATURATES (K60) by
  sf0.1, so edge-side work plateaus while the event scan grows — the
  probe records both to document the fixture's shape, not to claim
  graph-side linearity.

Usage: python scripts/scale_probe_r09.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEW = [
    "char_entropy", "readability", "zipf_fit", "tokenizer_fertility",
    "canary_scan", "cms_heavy", "kmeans_assign", "semdedup_prune",
    "interleave_shards", "grouping_sets_events", "outliers_mad",
    "ab_cuped", "csv_roundtrip", "jsonl_roundtrip", "triangle_count",
    "graph_summary", "rrf_fusion", "sft_render",
]


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in NEW:
        walls = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = None
            for _ in range(2):  # best-of-2 (2nd run = warm codegen)
                t0 = time.time()
                df = qs[name](spark, sf)
                df.write.format("noop").mode("overwrite").save()
                w = time.time() - t0
                best = w if best is None else min(best, w)
            walls[sf] = best
        r = walls["/root/testdata/sf0.1"] / max(walls["/root/testdata/sf0.01"], 1e-9)
        print(
            f"{name:22s} sf0.01={walls['/root/testdata/sf0.01']:6.2f}s "
            f"sf0.1={walls['/root/testdata/sf0.1']:6.2f}s  x{r:4.1f}"
        )


if __name__ == "__main__":
    main()
