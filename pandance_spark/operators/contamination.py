"""Benchmark-contamination check (SURVEY.md §2.4 extension surface).

Before training on a scraped corpus you must know which documents leak
evaluation data: any document sharing enough word n-grams with a
benchmark/eval document is contaminated and must be dropped or flagged.
This is the standard n-gram-overlap decontamination used by large-LM
data pipelines.

Spark-first design
------------------
The benchmark side is small by nature (eval sets are MBs; the corpus is
the 100 TB side), so the benchmark shingle index is broadcast: the
corpus side streams through a map-side hash join — no shuffle of corpus
data at all.  Work is proportional to corpus shingles + matches, and
the corpus scan prunes to (id, text) columns only.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandance_spark.functions.text import tokenize, word_shingles_from_tokens

__all__ = ["contamination_check", "novelty_stats"]


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    min_overlap: int = 1,
    bench_id_col: Optional[str] = None,
    bench_text_col: Optional[str] = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus documents sharing >= ``min_overlap`` distinct word
    ``shingle_n``-grams with any benchmark document.

    Returns ``(doc_id, bench_id, n_shared)`` — one row per contaminated
    (corpus doc, benchmark doc) pair.  ``filter`` + ``anti_join`` on
    ``doc_id`` decontaminates the corpus.

    ``broadcast_benchmark=True`` (default) asserts the benchmark fits in
    executor memory — the realistic contract (eval sets are tiny next to
    the corpus); the join then needs NO corpus shuffle.  Set it False to
    let AQE choose when the "benchmark" side is itself corpus-sized.

    ``shingle_n=8`` mirrors common LM decontamination practice; lower it
    for short documents.
    """
    bid = bench_id_col or id_col
    btext = bench_text_col or text_col

    def _shingled(df, id_src, id_out, text_src):
        # stage the token array behind a projection: the shingle
        # expression references it 3x, and unstaged each reference
        # re-runs the whole tokenize chain
        toks = df.select(
            F.col(id_src).alias(id_out),
            tokenize(F.col(text_src)).alias("__toks"),
        )
        return toks.select(
            id_out,
            F.explode(
                F.array_distinct(
                    word_shingles_from_tokens(F.col("__toks"), shingle_n)
                )
            ).alias("__sh"),
        )

    cor = _shingled(corpus, id_col, "doc_id", text_col)
    ben = _shingled(benchmark, bid, "bench_id", btext)
    if broadcast_benchmark:
        ben = F.broadcast(ben)
    return (
        cor.join(ben, "__sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def novelty_stats(
    docs: DataFrame,
    text_col: str,
    reference: DataFrame,
    ref_text_col: Optional[str] = None,
    shingle_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus — the
    inverse of :func:`contamination_check`: the fraction of a
    document's DISTINCT word ``shingle_n``-grams that the reference
    has never seen.  Low novelty means the document is recombined
    reference material (near-dup tails, templated spam, memorization
    candidates); high novelty marks genuinely new content worth
    keeping — the standard freshness signal when growing a corpus
    snapshot over snapshot.

    Returns ``(id_col, n_shingles, n_novel, novelty_rate)`` with the
    rate rounded to 9 dp (0.0 for shingle-less documents).

    Spark-first shape: unlike the benchmark side of
    ``contamination_check`` (MB-sized, broadcast), the reference here
    is another CORPUS — so this is a shuffle equi-join on the shingle
    STRING (Spark hash-partitions internally; a pre-hash would only
    trade portability for nothing).  The reference side deduplicates
    map-side (partial distinct before the exchange); the doc side
    explodes distinct-per-document shingles, so join input is bounded
    by distinct shingles, not token count; the final per-doc aggregate
    combines map-side to one counter row per document.
    """
    rcol = ref_text_col or text_col

    from pandance_spark.functions.text import word_shingle_hashes

    def _sh(col):
        # join keys are streamed 64-bit shingle hashes (8-byte longs
        # through the distinct + exchange, built via zip_with folds —
        # ~9x cheaper than string shingles at corpus scale); a 64-bit
        # collision would need ~5e9 distinct shingles for even-odds
        # and only ever flips one shingle to "seen"
        return F.array_distinct(word_shingle_hashes(col, shingle_n))

    rsh = (
        reference.select(F.explode(_sh(F.col(rcol))).alias("__sh"))
        .distinct()
        .withColumn("__seen", F.lit(True))
    )
    dsh = docs.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(_sh(F.col(text_col))).alias("__sh"),
    )
    j = dsh.join(rsh, "__sh", "left")
    return (
        j.groupBy("__id")
        .agg(
            F.count("__sh").alias("n_shingles"),
            F.sum(
                (F.col("__sh").isNotNull() & F.col("__seen").isNull())
                .cast("long")
            ).alias("n_novel"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_shingles",
            "n_novel",
            F.round(
                F.when(
                    F.col("n_shingles") > 0,
                    F.col("n_novel") / F.col("n_shingles"),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("novelty_rate"),
        )
    )
