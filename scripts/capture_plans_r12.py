"""Capture .explain("formatted") output for declared queries into
plans/r12/<query>_<tag>.txt — the optimization round's before/after
evidence files.

Usage: python scripts/capture_plans_r12.py <tag> [query ...]
       (no query args = the default heavy-hitter list)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT = [
    "record_linkage",
    "minhash_eval",
    "minhash_eval_sampled",
    "kmeans_assign",
    "char_entropy",
    "embed_pc1",
    "semdedup_prune",
    "winnow_long_grams",
    "winnow_fingerprints",
    "decontam_composed",
    "dedup_ngram_jaccard",
    "dedup_substrings",
    "rollup_qsketch",
    "dsir_select",
    "ineq_band_autoskew",
    "dedup_clusters",
    "ppl_buckets_kn",
    "semantic_dedup",
    "cms_heavy",
    "containment_quotes",
    "ineq_lt_balances",
    "rollup_bottomk",
    "keep_best",
    "keywords_tfidf",
    "ngram_novelty",
    "graph_summary",
    "simhash_eval",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("capture_plans_r12")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from pandance_spark.plans.mem import explain_str

    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = explain_str(df, "formatted")
        except Exception as e:  # capture the failure as evidence too
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan.strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
