"""Scale probes (r6, 4th batch): bloom_dedup, heavy_hitters,
image perceptual-hash banding.

Claims measured here, at two scales (N and 10N):

1. bloom_dedup's verification join input is ~|true overlap| +
   fpp * |clean batch| — NOT |batch| — and the whole path beats the
   plain anti-join it replaces while returning the identical result.
2. heavy_hitters returns the exact groupBy/HAVING answer while its
   exact pass shuffles only candidate occurrences — wall stays flat
   when the Zipf TAIL (distinct count) grows 10x with the head fixed.
3. hamming_candidates over image hashes: candidate pairs grow
   linearly with image count when duplicate-group SIZE is held (the
   banding is collision-proportional, not all-pairs).

Run: python scripts/scale_probe_r06d.py  (local[32], synthetic data —
uses no testdata so scales are free)
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
        .appName("scale_probe_r06d")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandance_spark.operators.bloom import _bloom_params, bloom_dedup

    # ---------------- probe 1: bloom_dedup ----------------
    print("== bloom_dedup ==")
    for n_idx, n_batch in ((2_000_000, 1_000_000), (20_000_000, 10_000_000)):
        # keys: index = k0..k{n_idx-1}; batch overlaps on 1% (ids ending
        # in 00 map into the index range), rest is fresh
        index = spark.range(n_idx).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
        )
        batch = spark.range(n_batch).select(
            F.when(
                F.col("id") % 100 == 0, F.concat(F.lit("k"), F.col("id").cast("string"))
            )
            .otherwise(F.concat(F.lit("new"), F.col("id").cast("string")))
            .alias("key")
        )
        t0 = time.time()
        got = bloom_dedup(batch, index, "key", fpp=0.01, expected_items=n_idx).count()
        bloom_s = time.time() - t0
        t0 = time.time()
        want = batch.join(index, "key", "left_anti").count()
        anti_s = time.time() - t0
        assert got == want == n_batch - n_batch // 100, (got, want)
        # independent positives count (the verification join's input)
        from pandance_spark.operators.bloom import _positions, _word_mask, _words_df

        m, k = _bloom_params(n_idx, 0.01)
        words = _words_df(index, ["key"], m, k, 42).localCheckpoint(eager=True)
        probes = batch.distinct().select(
            "key", F.explode(_positions([F.col("key")], m, k, 42)).alias("__bloom_pos")
        )
        word, mask = _word_mask(F.col("__bloom_pos"))
        positives = (
            probes.select("key", word.alias("__bloom_w"), mask.alias("__bloom_mask"))
            .join(F.broadcast(words.select("__bloom_w", "__bloom_bits")), "__bloom_w", "left")
            .select(
                "key",
                (
                    F.coalesce(F.col("__bloom_bits"), F.lit(0)).bitwiseAND(
                        F.col("__bloom_mask")
                    )
                    != 0
                ).alias("h"),
            )
            .groupBy("key")
            .agg(F.min("h").alias("a"))
            .filter("a")
            .count()
        )
        overlap = n_batch // 100
        clean = n_batch - overlap
        print(
            f"  idx={n_idx:>9,} batch={n_batch:>9,}: result {got:,} == anti {want:,}; "
            f"positives {positives:,} (overlap {overlap:,} + ~1% of {clean:,} clean); "
            f"inline bloom {bloom_s:.2f}s vs plain anti {anti_s:.2f}s"
        )
        assert positives < overlap + 0.03 * clean, positives

        # PRODUCTION mode: words persisted once (amortized across every
        # future batch), index bucketed by key — the verification join
        # then shuffles only the positives into the bucket layout,
        # while the plain anti-join must shuffle the WHOLE batch
        from pandance_spark.sources import save_bucketed

        save_bucketed(index, "bloom_probe_idx", "key", num_buckets=CPUS)
        idx_t = spark.table("bloom_probe_idx")
        t0 = time.time()
        got_p = bloom_dedup(batch, idx_t, "key", words=words).count()
        bloom_p_s = time.time() - t0
        t0 = time.time()
        want_p = batch.join(idx_t, "key", "left_anti").count()
        anti_p_s = time.time() - t0
        assert got_p == want_p == got
        print(
            f"    persisted-words + bucketed index: bloom {bloom_p_s:.2f}s "
            f"vs plain anti {anti_p_s:.2f}s (batch-side shuffle "
            f"{positives:,} keys vs {n_batch:,} rows)"
        )

    # ---------------- probe 2: heavy_hitters ----------------
    print("== heavy_hitters ==")
    from pandance_spark.functions.profile import heavy_hitters

    for n in (5_000_000, 50_000_000):
        # 10 hot tokens on 1% of rows; everything else a unique tail
        # (distinct count ~ 0.99 n -> grows 10x, the head does not)
        toks = spark.range(n).select(
            F.when(
                F.col("id") % 100 < 1,
                F.concat(F.lit("hot"), (F.col("id") % 10).cast("string")),
            )
            .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
            .alias("tok")
        )
        t0 = time.time()
        got = [
            (r["value"], r["cnt"])
            for r in heavy_hitters(toks, "tok", support=0.0005, k=20).collect()
        ]
        hh_s = time.time() - t0
        t0 = time.time()
        tot = n
        want = [
            (r["tok"], r["cnt"])
            for r in toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 0.0005 * tot)
            .orderBy(F.col("cnt").desc(), F.col("tok").asc())
            .limit(20)
            .collect()
        ]
        exact_s = time.time() - t0
        assert got == want, (got[:3], want[:3])
        print(
            f"  n={n:>10,} distinct~{int(n*0.99):,}: 10 hitters exact-match; "
            f"sketch+exact {hh_s:.2f}s vs full groupBy {exact_s:.2f}s"
        )

    # ---------------- probe 3: hamming banding growth ----------------
    print("== image-hash banding ==")
    from pandance_spark.operators.dedup import hamming_candidates

    for n_img in (9_000, 90_000):
        # 64-bit codes: groups of 6 share a code (pair structure of the
        # image fixture at scale, skipping the decode — the banding is
        # what must stay collision-proportional)
        sig = spark.range(n_img).select(
            F.col("id").alias("mid"),
            F.xxhash64((F.col("id") / 6).cast("long")).alias("code"),
        )
        t0 = time.time()
        pairs = hamming_candidates(sig, "mid", "code", max_hamming=2).count()
        wall = time.time() - t0
        want = (n_img // 6) * 15  # C(6,2) per group
        print(
            f"  images={n_img:>7,}: pairs {pairs:,} (expected ~{want:,}) in {wall:.2f}s"
        )
        assert abs(pairs - want) <= want * 0.001 + 50, (pairs, want)

    print("ALL r06d PROBES PASSED")


if __name__ == "__main__":
    main()
