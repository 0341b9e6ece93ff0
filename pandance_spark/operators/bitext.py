"""Parallel-corpus (bitext) candidate mining.

The multilingual-pipeline step the reference has no analog for: given
two monolingual document sets, surface candidate translation pairs
CHEAPLY, before any expensive cross-lingual embedding alignment runs.
The workhorse signal is translation-invariant content: numerals and
their order survive translation almost verbatim (dates, quantities,
section numbers), while words do not — the classic heuristic behind
Resnik-style STRAND and the pre-filters of CCAligned/CCMatrix
pipelines (see PAPERS.md).

Spark-first: per-document numeral fingerprints are pure projections,
the candidate join is an equi-join on the fingerprint hash (bucketed,
never all-pairs), and the per-pair score is a Column expression.  At
100 TB each side scans once and only fingerprint groups shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def numeral_fingerprint(text: Column, min_runs: int = 2) -> Column:
    """The ordered digit-run sequence of a document, as ONE string key
    (e.g. ``"1907,3,14"``), or NULL when fewer than ``min_runs`` runs
    exist (too little signal to block on — a lone "1" would bucket
    half the corpus together).  Leading zeros are preserved: "007" and
    "7" are different tokens in both languages or neither."""
    runs = F.filter(
        F.split(F.regexp_replace(text, r"[^0-9]+", " "), " "),
        lambda t: t != "",
    )
    key = F.array_join(runs, ",")
    return F.when(F.size(runs) >= min_runs, key)


def bitext_candidates(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    min_runs: int = 2,
    max_len_ratio: float = 2.0,
) -> DataFrame:
    """Candidate translation pairs: documents from the two sides whose
    ORDERED numeral sequences match exactly and whose character
    lengths are within ``max_len_ratio`` of each other (translations
    change length by tens of percent, not multiples — the STRAND
    length filter).

    Returns ``(left_id, right_id, n_runs, len_ratio)`` with
    ``len_ratio = round(longer/shorter, 6)``.  The join key is the
    numeral-sequence string itself — exact, portable, bucketed; a
    fingerprint shared by many documents (boilerplate numbers) fans
    out as a product within its bucket, so callers cap hot
    fingerprints upstream the same way every blocking join here does
    (``cap_per_group`` composes directly)."""
    fl = numeral_fingerprint(F.col(left_text), min_runs)
    fr = numeral_fingerprint(F.col(right_text), min_runs)
    a = left.select(
        F.col(left_id).alias("lid"),
        fl.alias("fp"),
        F.length(left_text).cast("long").alias("llen"),
    ).filter(F.col("fp").isNotNull())
    b = right.select(
        F.col(right_id).alias("rid"),
        fr.alias("fp"),
        F.length(right_text).cast("long").alias("rlen"),
    ).filter(F.col("fp").isNotNull())
    joined = a.join(b, "fp", "inner")
    ratio = F.greatest("llen", "rlen").cast("double") / F.least(
        "llen", "rlen"
    ).cast("double")
    return (
        joined.filter(
            (F.least("llen", "rlen") > 0) & (ratio <= F.lit(max_len_ratio))
        )
        .select(
            F.col("lid").alias(left_id if left_id != right_id else "lid"),
            F.col("rid").alias(right_id if left_id != right_id else "rid"),
            (F.size(F.split("fp", ",")).cast("long")).alias("n_runs"),
            F.round(ratio, 6).alias("len_ratio"),
        )
    )
