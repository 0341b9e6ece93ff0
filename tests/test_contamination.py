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


def test_novelty_stats_reference_and_novel_docs(spark):
    from pandance_spark.operators.contamination import novelty_stats

    ref = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),    # pure reference: 0.0
            (2, "the quick brown cat sleeps"),   # 1 of 3 shingles seen
            (3, "entirely novel text appears here"),  # all novel
            (4, "too short"),                    # shingle-less
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in novelty_stats(docs, "text", ref).collect()}
    assert out[1]["novelty_rate"] == 0.0 and out[1]["n_novel"] == 0
    assert out[2]["n_shingles"] == 3 and out[2]["n_novel"] == 2
    assert out[3]["n_novel"] == out[3]["n_shingles"] == 3
    assert out[3]["novelty_rate"] == 1.0
    assert (out[4]["n_shingles"], out[4]["novelty_rate"]) == (0, 0.0)
    # repeated shingles within a doc count once (distinct semantics)
    rep = spark.createDataFrame(
        [(9, "a b c a b c a b c")], ["doc_id", "text"]
    )
    r = novelty_stats(rep, "text", ref).collect()[0]
    assert r["n_shingles"] == 3  # 'a b c','b c a','c a b'
