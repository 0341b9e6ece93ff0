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

__all__ = ["contamination_check"]


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
