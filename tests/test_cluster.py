"""connected_components + dedup_clusters: exactness vs brute-force
transitive closure, chain/diamond/singleton shapes, canonical keepers."""

import random

import pytest
from pyspark.sql import functions as F

from pandance_spark.operators.cluster import connected_components, dedup_clusters


def _brute_components(edges, nodes):
    """Union-find ground truth on the driver."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, label = min of component
    comp = {}
    for n in nodes:
        comp[n] = find(n)
    # find() with min-merge keeps the min as root
    return comp


def _cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    # both codepaths must agree: driver union-find (guard passes) and
    # the distributed label-propagation loop (guard forced off)
    fast = connected_components(df, "src", "dst")
    dist = connected_components(df, "src", "dst", max_driver_edges=0)
    got_fast = {r["node"]: r["component"] for r in fast.collect()}
    got_dist = {r["node"]: r["component"] for r in dist.collect()}
    assert got_fast == got_dist
    return got_fast


def test_chain(spark):
    # long path graph: worst case for plain propagation, pointer
    # doubling must still converge within max_iter
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    got = _cc_dict(spark, edges)
    assert got == {i: 0 for i in range(n + 1)}


def test_two_components_and_diamond(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    got = _cc_dict(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_random_vs_brute_force(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc_dict(spark, edges)
    touched = {a for a, _ in edges} | {b for _, b in edges}
    want = _brute_components(edges, sorted(touched))
    assert got == want


def test_null_edges_ignored(spark):
    edges = [(1, 2), (None, 3), (4, None)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df, "src", "dst").collect()}
    assert got == {1: 1, 2: 1}


def test_string_node_ids(spark):
    edges = [("b", "c"), ("a", "b"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df, "src", "dst").collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dedup_clusters_with_precomputed_edges(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    out = dedup_clusters(docs, "doc_id", "text", edges=edges).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"]) for r in out}
    assert got == {
        0: (0, 3, 1),
        1: (0, 3, 0),
        2: (0, 3, 0),
        3: (3, 1, 1),
        4: (4, 1, 1),
        5: (5, 2, 1),
        6: (5, 2, 0),
        7: (7, 1, 1),
    }
    # keepers = deduplicated corpus: one doc per cluster
    keepers = [d for d, (_, _, k) in got.items() if k == 1]
    assert sorted(keepers) == [0, 3, 4, 5, 7]


def test_dedup_clusters_minhash_end_to_end(spark):
    # three exact-duplicate groups + noise docs; minhash at threshold
    # 0.9 must cluster the duplicates and leave noise as singletons
    base = [
        "spark shuffles hash partitions across executors for wide joins",
        "catalyst rewrites logical plans before tungsten code generation",
        "arrow batches stream pandas udf results back to the jvm runtime",
    ]
    rows, did = [], 0
    for b in base:
        for _ in range(3):  # 3 identical copies each
            rows.append((did, b + " word filler tail piece for shingles"))
            did += 1
    for i in range(5):
        rows.append((did, f"unique noise document number {i} with its own distinct vocabulary token{i}"))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_clusters(docs, "doc_id", "text", threshold=0.9).collect()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert got == {
        0: 0, 1: 0, 2: 0,
        3: 3, 4: 3, 5: 3,
        6: 6, 7: 6, 8: 6,
        9: 9, 10: 10, 11: 11, 12: 12, 13: 13,
    }
    n_canonical = sum(r["is_canonical"] for r in out)
    assert n_canonical == 8  # 3 clusters + 5 singletons


def _brute_pagerank(edges, n_iter=10, d=0.85, extra_nodes=()):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges} | set(extra_nodes))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = [1.0 / n] * n
    base = (1.0 - d) / n
    for _ in range(n_iter):
        inn = [0.0] * n
        for u, v in edges:
            inn[idx[v]] += r[idx[u]] * (1.0 / outdeg[u])
        dm = sum(r[idx[u]] for u in nodes if u not in outdeg)
        r = [base + d * (inn[i] + dm / n) for i in range(n)]
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_brute_force(spark):
    from pandance_spark.operators.cluster import pagerank

    # chain + hub + dangling sink: 1->2->3, 4->3, 3 dangles
    edges = [(1, 2), (2, 3), (4, 3), (4, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    want = _brute_pagerank(edges, n_iter=8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # mass conservation: ranks sum to 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # the sink everyone points to ranks highest
    assert got[3] == max(got.values())


def test_pagerank_extra_nodes_and_validation(spark):
    from pandance_spark.operators.cluster import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    iso = spark.createDataFrame([(9,)], "node long")
    got = {r["node"]: r["rank"] for r in pagerank(df, nodes=iso, n_iter=4).collect()}
    want = _brute_pagerank([(1, 2)], n_iter=4, extra_nodes=[9])
    assert set(got) == {1, 2, 9}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_keep_best_picks_max_score_with_deterministic_ties(spark):
    from pandance_spark.operators.cluster import keep_best

    df = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7), (5, 3)], "id int, q int"
    )
    cl = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)], "id int, cluster_id int"
    )
    got = {r["id"]: r["is_best"] for r in keep_best(df, cl, "id", F.col("q")).collect()}
    # cluster 1: ids 2 and 3 tie at q=50 -> smaller id wins; singletons keep
    assert got == {1: 0, 2: 1, 3: 0, 4: 1, 5: 1}


def test_keep_best_ascending(spark):
    from pandance_spark.operators.cluster import keep_best

    df = spark.createDataFrame([(1, 10), (2, 50)], "id int, q int")
    cl = spark.createDataFrame([(1, 1), (2, 1)], "id int, cluster_id int")
    got = {
        r["id"]: r["is_best"]
        for r in keep_best(df, cl, "id", F.col("q"), descending=False).collect()
    }
    assert got == {1: 1, 2: 0}


def test_keep_best_composes_with_dedup_clusters(spark):
    from pandance_spark.operators.cluster import dedup_clusters, keep_best

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today!"),
            (3, "completely different text about spark data engines"),
        ],
        "doc_id int, text string",
    ).withColumn("n_chars", F.length("text"))
    cl = dedup_clusters(docs, "doc_id", "text", threshold=0.5)
    out = keep_best(docs, cl, "doc_id", F.col("n_chars"))
    best = {r["doc_id"]: r["is_best"] for r in out.collect()}
    # docs 1,2 are near-dups; 2 is longer and must be the keeper
    assert best[2] == 1 and best[1] == 0 and best[3] == 1
    # exactly one keeper per cluster
    assert out.groupBy("cluster_id").agg(F.sum("is_best").alias("s")) \
              .filter("s <> 1").count() == 0


def test_keep_best_null_scores_never_win(spark):
    from pandance_spark.operators.cluster import keep_best

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, None), (4, 5)],
        "id int, q int",
    )
    cl = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "id int, cluster_id int"
    )
    for desc in (True, False):
        got = {
            r["id"]: r["is_best"]
            for r in keep_best(df, cl, "id", F.col("q"), descending=desc).collect()
        }
        # scored rows beat NULL-scored rows in both directions
        assert got[1] == 1 and got[2] == 0, (desc, got)
        assert got[4] == 1 and got[3] == 0, (desc, got)


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles (3 per vertex); adding a pendant vertex and
    duplicate/reversed/self-loop edges must change nothing."""
    from pandance_spark.operators.cluster import graph_summary, triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (3, 4), (0, 1)]
    df = spark.createDataFrame(noisy, "s long, d long")
    got = {r["vertex"]: r["n_triangles"]
           for r in triangle_count(df, "s", "d").collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # pendant vertex 4 absent
    g = graph_summary(df, "s", "d").collect()[0]
    assert g["n_vertices"] == 5 and g["n_edges"] == 7
    assert g["n_triangles"] == 4
    # wedges: degrees 3,3,3,4,1 -> 3+3+3+6+0 = 15; C = 12/15
    assert g["n_wedges"] == 15
    assert g["global_clustering"] == 0.8


def test_triangle_count_star_graph_no_blowup(spark):
    """A star (one celebrity hub) has zero triangles and — thanks to
    the degree orientation — zero wedge-join fanout from the hub: all
    edges point INTO it."""
    from pandance_spark.operators.cluster import graph_summary, triangle_count

    star = [(0, i) for i in range(1, 200)]
    df = spark.createDataFrame(star, "s long, d long")
    assert triangle_count(df, "s", "d").count() == 0
    g = graph_summary(df, "s", "d").collect()[0]
    assert g["n_triangles"] == 0 and g["global_clustering"] == 0.0
    assert g["n_wedges"] == 199 * 198 // 2
