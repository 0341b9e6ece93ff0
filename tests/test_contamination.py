"""contamination_check: overlap counting, threshold, broadcast plan."""

from pyspark.sql import functions as F

from pandance_spark.operators.contamination import contamination_check


def test_overlap_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here today"),
            (3, "quick brown fox runs fast"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps high")],
        "doc_id long, text string",
    )
    out = contamination_check(
        corpus, bench, "doc_id", "text", shingle_n=2, min_overlap=1
    ).collect()
    got = {(r["doc_id"], r["bench_id"]): r["n_shared"] for r in out}
    # doc 1 shares bigrams {quick brown, brown fox, fox jumps}; doc 3
    # shares {quick brown, brown fox}; doc 2 shares none
    assert got == {(1, 100): 3, (3, 100): 2}
    # threshold filters doc 3
    out3 = contamination_check(
        corpus, bench, "doc_id", "text", shingle_n=2, min_overlap=3
    ).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in out3} == {(1, 100)}


def test_duplicate_shingles_counted_once(spark):
    # repeated n-grams in either side must not inflate n_shared
    corpus = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "a b a b")], "doc_id long, text string"
    )
    out = contamination_check(
        corpus, bench, "doc_id", "text", shingle_n=2, min_overlap=1
    ).collect()
    # distinct shared bigrams = {'a b', 'b a'} -> 2
    assert {(r["doc_id"], r["bench_id"], r["n_shared"]) for r in out} == {(1, 9, 2)}


def test_benchmark_side_broadcast(spark):
    corpus = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "tok1 tok2 tok3")], "doc_id long, text string"
    )
    out = contamination_check(corpus, bench, "doc_id", "text", shingle_n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles
    assert out.count() == 3  # docs 0, 1, 2 overlap the bench bigrams
