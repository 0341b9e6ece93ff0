"""r6 (3rd session) scale probes: remove_boilerplate and BPE.

1. Boilerplate removal at N and 10N documents with the DISTINCT-line
   universe held constant: the 100 TB claim is that the stats shuffle
   carries distinct (scope, line, doc) triples and the boilerplate
   broadcast stays bounded by the recurring-line universe, never by
   corpus rows.  The probe asserts (a) every planted boilerplate line
   is removed and every unique line kept at both scales, (b) the
   boilerplate set size is IDENTICAL at N and 10N (it is a property
   of the line universe, not the row count), (c) the apply side of
   the plan has no Generate/explode and exactly one BroadcastHashJoin
   LeftOuter.

2. BPE learning at N and 10N corpus: with the word DISTRIBUTION held
   (same Zipf universe, 10x the rows), the word-count table row set
   is identical, so the learned merges must be byte-identical and the
   driver merge-loop time must not scale with corpus rows — only the
   distributed count pass does.  The probe asserts merge equality and
   reports count-pass vs merge-loop wall separately.

Prints one JSON line per probe; paste results into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale_probe_r06c")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark.operators.dedup import remove_boilerplate

    # --- probe 1: boilerplate at N vs 10N, fixed line universe -----
    # Each doc: 1 hot nav line, 3 unique body lines, 1 hot footer.
    # doc_id % 50 takes only 5 values within each doc_id % 10 domain
    # class, so the hot-line universe is 10 domains x (5 navs + 1
    # footer) = 60 lines, independent of N.
    def corpus(n):
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("d"), (F.col("id") % 10).cast("string")).alias(
                "domain"
            ),
        )
        nav = F.concat(
            F.lit("nav "), F.col("domain"), F.lit(" v"),
            (F.col("doc_id") % 50).cast("string"),
        )
        body = F.concat_ws(
            "\n",
            F.concat(F.lit("body "), F.col("doc_id"), F.lit(" a")),
            F.concat(F.lit("body "), F.col("doc_id"), F.lit(" b")),
            F.concat(F.lit("body "), F.col("doc_id"), F.lit(" c")),
        )
        footer = F.concat(F.lit("footer of "), F.col("domain"))
        return base.select(
            "doc_id", "domain",
            F.concat_ws("\n", nav, body, footer).alias("text"),
        )

    results = {}
    for n in (100_000, 1_000_000):
        df = corpus(n).localCheckpoint(eager=True)
        out = remove_boilerplate(
            df, "doc_id", "text", scope_col="domain", min_docs=3
        )
        t0 = time.time()
        agg = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_lines").alias("lines"),
            F.sum("n_kept").alias("kept"),
        ).collect()[0]
        wall = time.time() - t0
        # every doc: 5 lines, hot nav+footer removed -> exactly 3 kept
        assert agg["docs"] == n, agg
        assert agg["lines"] == 5 * n, agg
        assert agg["kept"] == 3 * n, agg
        if n == 100_000:
            # AQE picks the join strategy at RUNTIME (the initial
            # plan shows SortMergeJoin until the 510-row boilerplate
            # side is materialized) — execute THIS frame, then read
            # the finalized adaptive plan
            out.collect()
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan, "plan not finalized"
            assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, (
                "apply side not broadcast at runtime"
            )
        results[n] = {"wall_s": round(wall, 2)}
        df.unpersist()

    # boilerplate set size must be scale-invariant (property of the
    # line universe): recompute it directly at both scales
    bp_sizes = {}
    for n in (100_000, 1_000_000):
        df = corpus(n)
        lines = df.select(
            "domain", F.explode(F.split("text", "\n")).alias("line"), "doc_id"
        )
        bp_sizes[n] = (
            lines.groupBy("domain", "line")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df") >= 3)
            .count()
        )
    assert bp_sizes[100_000] == bp_sizes[1_000_000] == 60, bp_sizes
    print(json.dumps({
        "probe": "boilerplate_10x",
        "wall_100k_s": results[100_000]["wall_s"],
        "wall_1m_s": results[1_000_000]["wall_s"],
        "bp_set_size_both_scales": bp_sizes[1_000_000],
        "kept_per_doc_exact": 3,
    }))

    # --- probe 2: BPE learn at N vs 10N, fixed word universe --------
    from pandance_spark.functions.bpe import learn_bpe, word_counts

    words = [
        "alpha", "alphabet", "better", "betting", "bet", "widget",
        "widgets", "window", "windows", "wind", "winner", "winter",
    ]

    def text_corpus(n):
        # doc i carries word (i % len) three times + neighbor once:
        # the word DISTRIBUTION is fixed, rows scale
        w = F.element_at(
            F.array(*[F.lit(x) for x in words]),
            (F.col("id") % len(words) + 1).cast("int"),
        )
        w2 = F.element_at(
            F.array(*[F.lit(x) for x in words]),
            ((F.col("id") + 1) % len(words) + 1).cast("int"),
        )
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", w, w, w, w2).alias("text"),
        )

    merges = {}
    for n in (100_000, 1_000_000):
        df = text_corpus(n).localCheckpoint(eager=True)
        t0 = time.time()
        wc_rows = word_counts(df, "text", 50_000).collect()
        t_count = time.time() - t0
        t0 = time.time()
        merges[n] = learn_bpe(df, "text", num_merges=200, vocab_cap=50_000)
        t_total = time.time() - t0
        df.unpersist()
        print(json.dumps({
            "probe": "bpe_learn", "rows": n,
            "distinct_words": len(wc_rows),
            "count_pass_s": round(t_count, 2),
            "learn_total_s": round(t_total, 2),
            "n_merges": len(merges[n]),
        }))
    assert merges[100_000] == merges[1_000_000], (
        "merges must be independent of corpus row count at fixed "
        "word distribution"
    )
    print(json.dumps({"probe": "bpe_merges_scale_invariant", "ok": True}))
    spark.stop()


if __name__ == "__main__":
    main()
