"""Similarity search tests (engine extensions, SURVEY.md §2.4)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pandance_spark.functions.vectors import cosine_similarity, dot, l2_distance, l2_norm
from pandance_spark.operators.similarity import ann_lsh_topk, cosine_topk


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        dot(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("na"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        l2_distance(F.col("a"), F.col("b")).alias("dist"),
    ).first()
    assert r["dot"] == pytest.approx(4.0)
    assert r["na"] == pytest.approx(3.0)
    assert r["cos"] == pytest.approx(4.0 / (3.0 * 5.0**0.5))
    assert r["dist"] == pytest.approx((1 + 4 + 1) ** 0.5)


def test_cosine_topk_golden(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [-1.0, 0.0]),
        ],
        "cid long, embedding array<double>",
    )
    queries = spark.createDataFrame([(100, [1.0, 0.0])], "qid long, embedding array<double>")
    out = cosine_topk(queries, corpus, "qid", "cid", k=2).orderBy("rank").collect()
    assert [r["cid"] for r in out] == [1, 2]
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert [r["rank"] for r in out] == [1, 2]


def test_cosine_topk_on_embeddings(spark, sf_dir):
    from pandance_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(queries, emb, "vec_id", "vec_id", k=3)
    rows = out.collect()
    # each query's rank-1 hit is itself with cosine ~1
    by_q = {}
    for r in rows:
        by_q.setdefault(r[0], []).append(r)
    for q, lst in by_q.items():
        top = min(lst, key=lambda r: r["rank"])
        assert top["cosine"] == pytest.approx(1.0, abs=1e-4)


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    from pandance_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(queries, emb, "vec_id", "vec_id", k=5)
    # note: uniformly random embeddings are the worst case for LSH
    # (near-orthogonal vectors); few planes = large buckets = high recall
    approx = ann_lsh_topk(
        queries, emb, "vec_id", "vec_id", k=5, dim=64, num_planes=4
    )
    # column-name collision across the two frames: rename for clarity
    e = {(r[0], r[1]) for r in exact.collect()}
    a = {(r[0], r[1]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    from pandance_spark.operators.similarity import ann_ivf_topk
    from pandance_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(queries, emb, "vec_id", "vec_id", k=5)
    approx = ann_ivf_topk(
        queries, emb, "vec_id", "vec_id", k=5, n_clusters=8, n_probe=4
    )
    e = {(r[0], r[1]) for r in exact.collect()}
    a = {(r[0], r[1]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing half the cells on near-orthogonal random vectors
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # rank-1 self-hit always survives (a query's own cell is probed)
    by_q = {}
    for r in approx.collect():
        by_q.setdefault(r[0], []).append(r)
    for q, lst in by_q.items():
        top = min(lst, key=lambda r: r["rank"])
        assert top[1] == q and top["cosine"] == pytest.approx(1.0, abs=1e-4)


def test_l2_normalize(spark):
    from pandance_spark.functions.vectors import l2_norm, l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id long, v array<double>"
    )
    out = df.select("id", l2_normalize(F.col("v")).alias("u"),
                    F.round(l2_norm(l2_normalize(F.col("v"))), 9).alias("n")).collect()
    got = {r["id"]: (r["u"], r["n"]) for r in out}
    assert got[1][0] == [0.6, 0.8] and got[1][1] == 1.0
    assert got[2][0] == [0.0, 0.0] and got[2][1] == 0.0  # zero vec passes through


def test_embedding_centroids(spark):
    from pandance_spark.functions.vectors import embedding_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 10.0]), (0, [3.0, 20.0]), (1, [5.0, 6.0])],
        "label int, v array<double>",
    )
    out = embedding_centroids(df, "label", "v").collect()
    got = {(r["label"], r["pos"]): (r["centroid"], r["n"]) for r in out}
    assert got == {
        (0, 0): (2.0, 2), (0, 1): (15.0, 2),
        (1, 0): (5.0, 1), (1, 1): (6.0, 1),
    }


# ------------------------------------------------------------- knn_graph


def test_knn_graph_full_probe_equals_exact(spark):
    """Probing every cell makes the IVF graph exact — compare against
    brute-force cosine_topk with self-pairs removed."""
    import random

    from pandance_spark.operators.similarity import cosine_topk, knn_graph

    random.seed(7)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = [rows[i][1] for i in range(4)]
    got = knn_graph(
        df, "vec_id", "embedding", k=3, n_clusters=4, n_probe=4,
        centroids=centroids,
    )
    exact = cosine_topk(df, df, "vec_id", "vec_id", k=4)
    exact_nonself = (
        exact.filter(F.col("vec_id_x") != F.col("vec_id_y"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("vec_id_x").orderBy(
                    F.col("cosine").desc(), F.col("vec_id_y")
                )
            ),
        )
        .filter(F.col("rank") <= 3)
    )
    a = {(r["vec_id_x"], r["rank"]): r["vec_id_y"] for r in got.collect()}
    b = {(r["vec_id_x"], r["rank"]): r["vec_id_y"] for r in exact_nonself.collect()}
    assert a == b


def test_knn_graph_no_self_pairs(spark):
    import random

    from pandance_spark.operators.similarity import knn_graph

    random.seed(11)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_graph(
        df, "vec_id", "embedding", k=2, n_clusters=4, n_probe=2,
        centroids=[rows[i][1] for i in range(4)],
    ).collect()
    assert all(r["vec_id_x"] != r["vec_id_y"] for r in out)
    assert all(1 <= r["rank"] <= 2 for r in out)


def test_knn_graph_gemm_equals_expr(spark):
    import random

    from pandance_spark.operators.similarity import knn_graph

    random.seed(23)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [rows[i][1] for i in range(6)]
    kw = dict(k=4, n_clusters=6, n_probe=3, centroids=cents)
    a = knn_graph(df, "vec_id", "embedding", strategy="gemm", **kw)
    b = knn_graph(df, "vec_id", "embedding", strategy="expr", **kw)
    ka = {(r["vec_id_x"], r["rank"]): (r["vec_id_y"], r["cosine"]) for r in a.collect()}
    kb = {(r["vec_id_x"], r["rank"]): (r["vec_id_y"], r["cosine"]) for r in b.collect()}
    assert set(ka) == set(kb)
    for key in ka:
        assert ka[key][0] == kb[key][0]
        assert abs(ka[key][1] - kb[key][1]) < 1e-9


def test_knn_graph_hot_cell_salting_identical(spark):
    """All vectors land in one IVF cell (hot cell); salting must bound
    per-task size while producing the identical kNN graph."""
    import random

    from pandance_spark.operators.similarity import knn_graph

    random.seed(31)
    # cluster every vector near one centroid -> single hot cell
    base = [random.uniform(-0.1, 0.1) for _ in range(8)]
    rows = [
        (i, [b + random.uniform(-0.05, 0.05) for b in base]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [rows[0][1], [10.0] * 8, [-10.0] * 8, [5.0] * 8]
    kw = dict(k=3, n_clusters=4, n_probe=2, centroids=cents)
    plain = knn_graph(df, "vec_id", "embedding", **kw)
    salted = knn_graph(df, "vec_id", "embedding", max_cell_rows=8, **kw)
    a = {(r["vec_id_x"], r["rank"]): (r["vec_id_y"], r["cosine"]) for r in plain.collect()}
    b = {(r["vec_id_x"], r["rank"]): (r["vec_id_y"], r["cosine"]) for r in salted.collect()}
    assert a == b


def test_ivf_index_roundtrip_matches_direct(spark):
    """build_ivf_index -> ann_ivf_search equals ann_ivf_topk on the
    same centroids; the stored side is bucketed on cell (no corpus
    shuffle in the search plan)."""
    import random

    from pandance_spark.operators.similarity import (
        ann_ivf_search,
        ann_ivf_topk,
        build_ivf_index,
    )

    random.seed(43)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [rows[i][1] for i in range(4)]
    got_cents = build_ivf_index(
        df, "vec_id", "embedding", "ivf_test_idx", n_clusters=4,
        centroids=cents, num_buckets=4,
    )
    assert len(got_cents) == 4
    queries = df.limit(5)
    via_index = ann_ivf_search(
        spark, queries, "vec_id", "ivf_test_idx", got_cents, k=3, n_probe=2
    )
    direct = ann_ivf_topk(
        queries, df, "vec_id", "vec_id", k=3, n_clusters=4, n_probe=2,
        centroids=cents,
    )
    a = {(r["vec_id_x"], r["rank"]): (r["vec_id_y"], r["cosine"]) for r in via_index.collect()}
    b = {(r["vec_id_x"], r["rank"]): (r["vec_id_y"], r["cosine"]) for r in direct.collect()}
    assert a == b
    # the index side must come back pre-bucketed: no shuffle Exchange
    # on the corpus branch of the join
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    spark.sql("DROP TABLE IF EXISTS ivf_test_idx")


def test_build_ivf_index_requires_centroids(spark):
    import pytest as _pytest

    from pandance_spark.operators.similarity import build_ivf_index

    df = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError):
        build_ivf_index(df, "vec_id", "embedding", "ivf_test_idx2")


def test_quantize_embedding_roundtrip_and_ann_recall(spark):
    """int8 quantization: elementwise error bounded by scale/2, and
    cosine top-k over dequantized vectors matches exact top-k on
    well-separated data."""
    import random

    from pyspark.sql import functions as F

    from pandance_spark.functions.vectors import (
        dequantize_embedding,
        quantize_embedding,
    )
    from pandance_spark.operators.similarity import cosine_topk

    random.seed(11)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    rows.append((999, [0.0] * 16))  # zero vector edge case
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.withColumn("q", quantize_embedding(F.col("embedding"), bits=8))
    back = q.withColumn("deq", dequantize_embedding(F.col("q")))

    err = back.selectExpr(
        "vec_id",
        "q.scale AS scale",
        "aggregate(zip_with(embedding, deq, (a, b) -> abs(a - b)),"
        " 0D, (m, x) -> greatest(m, x)) AS max_err",
    ).collect()
    for r in err:
        # half-up rounding: |x - code*scale| <= scale/2 (+ float fuzz)
        assert r["max_err"] <= r["scale"] / 2 + 1e-12, r
    zero = back.filter("vec_id = 999").first()
    assert zero["q"]["scale"] == 0.0 and set(zero["deq"]) == {0.0}

    # ANN recall: top-3 on dequantized == top-3 exact for every query
    deq = back.select("vec_id", F.col("deq").alias("embedding")).filter(
        "vec_id != 999"
    )
    exact_df = df.filter("vec_id != 999")
    queries = exact_df.limit(5)
    a = {
        (r["vec_id_x"], r["rank"]): r["vec_id_y"]
        for r in cosine_topk(queries, exact_df, "vec_id", "vec_id", k=3).collect()
    }
    b = {
        (r["vec_id_x"], r["rank"]): r["vec_id_y"]
        for r in cosine_topk(
            queries.select("vec_id", "embedding"), deq, "vec_id", "vec_id", k=3
        ).collect()
    }
    agree = sum(1 for k in a if b.get(k) == a[k])
    assert agree / len(a) >= 0.9, (agree, len(a))


def test_lsh_bucket_long_range_many_planes(spark):
    # 40 planes: an int32 accumulator would wrap negative; the fold
    # must stay in [0, 2^40) (long arithmetic)
    from pandance_spark.operators.similarity import lsh_bucket
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([float(i % 7 - 3) for i in range(16)],)], "v array<float>"
    )
    b = df.select(lsh_bucket(F.col("v"), 16, 40, seed=1).alias("b")).first()["b"]
    assert 0 <= b < (1 << 40)


# ------------------------------------------------------- JL projection
def test_project_embedding_exact_and_deterministic(spark):
    import hashlib
    import math

    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.vectors import (
        project_embedding,
        projection_signs,
    )

    vec = [0.25 * ((i % 7) - 3) for i in range(16)]
    df = spark.createDataFrame([Row(id=1, v=vec)])
    out = df.select(
        project_embedding(F.col("v"), in_dim=16, out_dim=4).alias("p")
    ).collect()[0]["p"]
    signs = projection_signs(16, 4)
    q = [round(x * 1048576.0) for x in vec]
    scale = 1.0 / (1048576.0 * math.sqrt(4))
    exp = [float(sum(q[i] * signs[j][i] for i in range(16))) * scale for j in range(4)]
    assert out == exp  # bit-exact, no tolerance
    # signs closed form is md5 parity
    assert signs[2][5] == (
        1 if int(hashlib.md5(b"42:5:2").hexdigest()[0], 16) % 2 == 0 else -1
    )


def test_project_embedding_preserves_distances_approximately(spark):
    import random

    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.vectors import project_embedding

    rnd = random.Random(7)
    vecs = [[rnd.gauss(0, 1) for _ in range(64)] for _ in range(20)]
    df = spark.createDataFrame([Row(id=i, v=v) for i, v in enumerate(vecs)])
    proj = {
        r["id"]: r["p"]
        for r in df.select(
            "id", project_embedding(F.col("v"), 64, 16).alias("p")
        ).collect()
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ratios = [
        d2(proj[i], proj[j]) / d2(vecs[i], vecs[j])
        for i in range(20)
        for j in range(i + 1, 20)
    ]
    # JL with k=16: distance ratios concentrate around 1
    assert 0.2 < min(ratios) and max(ratios) < 3.0
    assert 0.8 < sum(ratios) / len(ratios) < 1.25


def test_project_embedding_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pandance_spark.functions.vectors import project_embedding

    with _pytest.raises(ValueError):
        project_embedding(F.col("v"), in_dim=0, out_dim=4)
    with _pytest.raises(ValueError):
        project_embedding(F.col("v"), in_dim=4, out_dim=0)


def test_project_embedding_wrong_length_yields_null(spark):
    from pyspark.sql import Row, functions as F

    from pandance_spark.functions.vectors import project_embedding

    df = spark.createDataFrame(
        [Row(id=1, v=[1.0, 2.0]), Row(id=2, v=[1.0, 2.0, 3.0, 4.0, 5.0])]
    )
    rows = {
        r["id"]: r["p"]
        for r in df.select(
            "id", project_embedding(F.col("v"), in_dim=4, out_dim=2).alias("p")
        ).collect()
    }
    # shorter AND longer than in_dim both yield NULLs, never a silent
    # truncated projection
    assert rows[1] == [None, None]
    assert rows[2] == [None, None]


def test_top_component_matches_numpy_and_partitioning(spark):
    import numpy as np

    from pandance_spark.functions.vectors import (
        pc1_projection,
        top_component,
    )

    rng = np.random.RandomState(7)
    # anisotropic cloud: strong direction u plus noise
    u = rng.randn(16)
    u /= np.linalg.norm(u)
    X = np.outer(rng.randn(300) * 3.0, u) + 0.3 * rng.randn(300, 16)
    X = np.clip(X / 10.0, -0.5, 0.5)
    rows = [(i, [float(v) for v in X[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    n, s, pc1 = top_component(df, "embedding", 16, iters=40)
    assert n == 300
    # unit-norm to rounding precision
    assert abs(sum(v * v for v in pc1) - 1.0) < 1e-6
    # agrees with numpy PCA on the quantized data up to sign
    Q = np.round(X * 1048576.0)
    C = np.cov(Q.T, bias=True) / 1048576.0**2
    w, V = np.linalg.eigh(C)
    ref = V[:, -1]
    cos = abs(float(np.dot(ref, pc1)))
    assert cos > 0.9999, cos
    # bit-identical under repartitioning (exact integer moments)
    _, _, pc1b = top_component(df.repartition(13), "embedding", 16, iters=40)
    assert pc1 == pc1b
    # projections: mean ~ 0 (centered), variance ~ top eigenvalue
    proj = [
        r["pc1_proj"]
        for r in pc1_projection(df, "embedding", 16, iters=40).collect()
    ]
    assert abs(sum(proj) / len(proj)) < 1e-6
    assert abs(np.var(proj) - w[-1]) / w[-1] < 1e-3


def test_remove_top_component_kills_pc1(spark):
    import numpy as np

    from pandance_spark.functions.vectors import (
        remove_top_component,
        top_component,
    )

    rng = np.random.RandomState(3)
    u = rng.randn(8)
    u /= np.linalg.norm(u)
    X = np.outer(rng.randn(200) * 2.0, u) + 0.2 * rng.randn(200, 8)
    X = np.clip(X / 8.0, -0.5, 0.5)
    rows = [(i, [float(v) for v in X[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    _, _, pc1 = top_component(df, "embedding", 8)
    out = remove_top_component(df, "embedding", 8).collect()
    M = np.array([r["vec_abtt"] for r in out])
    # corrected vectors are orthogonal to the removed component
    resid = M @ np.array(pc1)
    assert float(np.abs(resid).max()) < 1e-6
    # and centered
    assert float(np.abs(M.mean(axis=0)).max()) < 1e-6


def test_pc1_projection_large_magnitudes_exact(spark):
    """Inputs far above the ~unit micro-unit convention (|x| ~ 1e5)
    used to wrap int64 in the q*p fold (q ~ 2^20*|x| times p ~ 1e9
    passes 2^63 at |x| ~ 9e3; ADVICE r8).  The decimal-factor fold
    must reproduce the exact Python-int replay at any magnitude."""
    import numpy as np

    from pandance_spark.functions.vectors import (
        pc1_projection,
        top_component,
    )

    rng = np.random.RandomState(11)
    u = rng.randn(8)
    u /= np.linalg.norm(u)
    X = np.outer(rng.randn(80) * 3.0, u) + 0.3 * rng.randn(80, 8)
    X = X * 1.0e5  # far beyond the unit convention
    rows = [(i, [float(v) for v in X[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    n, s, pc1 = top_component(df, "embedding", 8, iters=40)
    # exact driver-side replay of the documented arithmetic
    p = [int(round(v * 1e9)) for v in pc1]
    spmu = sum(pi * si for pi, si in zip(p, s))
    got = {
        r["vec_id"]: r["pc1_proj"]
        for r in pc1_projection(df, "embedding", 8, iters=40).collect()
    }
    import decimal

    def round_half_up(v: float, dp: int = 9) -> float:
        # Spark F.round is HALF_UP; Python round() is half-even — at
        # 1e5 magnitudes the 9-dp grid CAN hit representable ties
        return float(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal(1).scaleb(-dp),
                rounding=decimal.ROUND_HALF_UP,
            )
        )

    for i in range(80):
        q = [int(round(x * 1048576.0)) for x in X[i]]
        dq = sum(a * b for a, b in zip(q, p))  # exact Python int
        t = (float(dq) - spmu / n) / (1048576.0 * 1.0e9)
        assert got[i] == round_half_up(t), (i, got[i], t)


def test_kmeans_exact_family(spark):
    """Seeding is deterministic under repartitioning; assignment is
    exact-integer argmin with first-min ties; update means equal a
    driver-side exact replay; semdedup finds planted scaled copies and
    nothing below threshold."""
    import numpy as np
    from pyspark.sql import functions as F

    from pandance_spark.operators.similarity import (
        hash_seed_centroids,
        kmeans_assign_exact,
        kmeans_update_exact,
        semdedup_pairs,
    )

    rng = np.random.RandomState(5)
    X = rng.randn(120, 16) * 0.3
    rows = [(i, [float(v) for v in X[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = hash_seed_centroids(df, "vec_id", "embedding", 16, 4)
    C2 = hash_seed_centroids(df.repartition(7), "vec_id", "embedding", 16, 4)
    assert C == C2
    asg = {r["vec_id"]: (r["cluster"], r["dist2"])
           for r in kmeans_assign_exact(df, "vec_id", "embedding", C).collect()}
    # driver-side replay
    Q = {i: [int(round(x * 1048576.0)) for x in map(float, X[i])]
         for i in range(120)}
    for i, q in Q.items():
        d = [sum((a - b) ** 2 for a, b in zip(q, c)) for c in C]
        assert asg[i] == (d.index(min(d)), min(d)), i
    upd = {r["cluster"]: r for r in
           kmeans_update_exact(df, "vec_id", "embedding", C).collect()}
    for cl, r in upd.items():
        members = [i for i in Q if asg[i][0] == cl]
        assert r["n_vecs"] == len(members)
        assert int(r["inertia"]) == sum(asg[i][1] for i in members)
        sums = [sum(Q[i][j] for i in members) for j in range(16)]
        exp = ",".join(str(int(_round_half_away(s / len(members))))
                       for s in sums)
        assert r["mean_q_csv"] == exp, (cl, r["mean_q_csv"], exp)
    # plant a scaled near-dup of row 0; no other pair crosses 0.9
    dup = spark.createDataFrame(
        [(999, [float(v) * 0.9 for v in X[0]])],
        "vec_id long, embedding array<double>",
    )
    corpus = df.unionAll(dup)
    C3 = hash_seed_centroids(corpus, "vec_id", "embedding", 16, 4)
    pairs = semdedup_pairs(corpus, "vec_id", "embedding", C3, 9, 10).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 999) in got
    # verify every reported pair really clears 0.9 in exact arithmetic
    Q[999] = [int(round(float(v) * 0.9 * 1048576.0)) for v in X[0]]
    for a, b in got:
        dot = sum(x * y for x, y in zip(Q[a], Q[b]))
        na = sum(x * x for x in Q[a])
        nb = sum(x * x for x in Q[b])
        assert dot > 0 and 100 * dot * dot > 81 * na * nb, (a, b)


def _round_half_away(v: float) -> int:
    import decimal

    return int(
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_kmeans_validation(spark):
    import pytest

    from pandance_spark.operators.similarity import hash_seed_centroids

    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        hash_seed_centroids(df, "vec_id", "embedding", 2, 0)
    with pytest.raises(ValueError):  # only 1 valid vector for k=2
        hash_seed_centroids(df, "vec_id", "embedding", 2, 2)
    # wrong-length vectors are excluded, not silently mis-assigned
    with pytest.raises(ValueError):
        hash_seed_centroids(df, "vec_id", "embedding", 3, 1)


def test_mmr_rerank_matches_python_greedy(spark):
    """mmr_rerank == a pure-python greedy replay (same 6-dp rounding,
    same smallest-id tie-break), and redundancy is actually penalized:
    with a duplicated top passage, plain top-k keeps both copies, MMR
    keeps one and pulls in the diverse doc."""
    import math

    from pandance_spark.operators.similarity import cosine_topk, mmr_rerank

    def v(*xs):
        return [float(x) for x in xs]

    corpus_rows = [
        (0, v(1, 0, 0)),      # duplicate of 1
        (1, v(1, 0, 0)),      # duplicate of 0
        (2, v(0.9, 0.1, 0)),  # near-dup of 0/1
        (3, v(0, 1, 0)),      # diverse, mid relevance
        (4, v(0, 0, 1)),      # irrelevant
    ]
    queries_rows = [(100, v(1, 0.2, 0))]
    corpus = spark.createDataFrame(corpus_rows, "vid long, embedding array<double>")
    queries = spark.createDataFrame(queries_rows, "vid long, embedding array<double>")

    lamb = 0.5
    got = [
        (r["vid_y"], r["mmr_rank"], r["relevance"], r["mmr_score"])
        for r in mmr_rerank(
            queries, corpus, "vid", "vid", k=3, pool=5, lamb=lamb
        ).orderBy("mmr_rank").collect()
    ]

    # pure-python replay
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    q = queries_rows[0][1]
    mu = 1.0 - lamb
    rel = {i: cos(q, e) for i, e in corpus_rows}
    remaining = dict(corpus_rows)
    maxsim = {i: 0.0 for i, _ in corpus_rows}
    want = []
    for rank in range(1, 4):
        best = max(
            remaining,
            key=lambda i: (round(lamb * rel[i] - mu * maxsim[i], 6), -i),
        )
        want.append(
            (best, rank, rel[best],
             round(lamb * rel[best] - mu * maxsim[best], 6))
        )
        sv = remaining.pop(best)
        for i, e in remaining.items():
            maxsim[i] = max(maxsim[i], cos(e, sv))
    assert got == want
    # top-1 is the most relevant (2); the near-identical pair 0/1
    # collapses under the redundancy penalty — NEITHER makes the top-3
    # (diverse 3 and even irrelevant-but-novel 4 outrank them)
    assert got[0][0] == 2 and got[1][0] == 3
    assert {0, 1}.isdisjoint({g[0] for g in got})
    # plain top-3 keeps BOTH duplicates (ranks 2-3)
    plain = [
        r["vid_y"]
        for r in cosine_topk(queries, corpus, "vid", "vid", k=3)
        .orderBy("rank").collect()
    ]
    assert plain[0] == 2 and set(plain[1:]) == {0, 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pool"):
        mmr_rerank(queries, corpus, "vid", "vid", k=5, pool=3)
    with _pytest.raises(ValueError, match="lamb"):
        mmr_rerank(queries, corpus, "vid", "vid", lamb=1.5)
