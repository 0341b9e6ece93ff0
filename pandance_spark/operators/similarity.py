"""Similarity search over embedding columns (``array<float>``).

Engine extensions beyond the reference (SURVEY.md §2.4).  Note the
conceptual kinship with the reference's ``fuzzy_join``: approximate
nearest neighbor IS a distributed fuzzy join in vector space — the
LSH-bucket path here mirrors the band-bucket rewrite of
``operators/fuzzy.py`` (bucket -> equi-join -> exact re-check).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Broadcast the (small) query set; scan the corpus once; per-partition
  cosine + global top-k via window.  Work O(|Q| * |corpus|), fully
  distributed, no Python.
- ``lsh_bucket``/``ann_lsh_topk``: random-hyperplane LSH — the scale
  path.  Bucket the corpus once (per-row expressions), equi-join probes
  to buckets (optionally multi-probe), exact cosine within buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandance_spark.functions.vectors import cosine_similarity, dot

__all__ = ["cosine_topk", "lsh_bucket", "ann_lsh_topk", "ann_ivf_topk"]


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k corpus neighbors per query by cosine similarity.

    Returns (query_id, corpus_id, cosine, rank), rank 1..k, ties broken
    by corpus id (deterministic).  The query side is broadcast — at
    scale the corpus is the huge side and scans once.
    """
    qname, cname = _out_names(query_id, corpus_id)
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).cast("array<double>").alias("__cv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col("__qid").alias(qname),
        F.col("__cid").alias(cname),
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(qname).orderBy(
        F.col("cosine").desc(), F.col(cname).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _out_names(query_id: str, corpus_id: str):
    """Output id column names; suffixed pandas-style when they collide
    (same convention as the join operators' ('_x', '_y'))."""
    if query_id == corpus_id:
        return query_id + "_x", corpus_id + "_y"
    return query_id, corpus_id


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: Optional[list] = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantizer cells.

    Index build: assign every corpus vector its nearest-centroid cell —
    a one-off batch job whose output would be persisted (bucketed by
    cell) in a real deployment.  Centroids come from a KMeans fit over
    the corpus (pyspark.ml, the default), or from ``centroids`` — a
    caller-supplied ``[[float, ...], ...]`` list (e.g. sampled corpus
    vectors, the kmeans++-init shape).  With explicit centroids the
    assignment is a pure Column expression argmin over literal arrays —
    no ML fit, no window, no shuffle for the assignment stage, and the
    whole search is deterministic + SQL-expressible (the DuckDB oracle
    recomputes it).
    Search: each query visits only its ``n_probe`` nearest cells — an
    equi-join on cell id + exact cosine + window top-k, so the scan cost
    drops to ~``n_probe / n_clusters`` of the brute-force baseline.

    Same output schema as :func:`cosine_topk`; recall < 1 by design
    (raise ``n_probe`` to trade speed for recall).
    """
    from pandance_spark.functions.vectors import l2_distance

    qname, cname = _out_names(query_id, corpus_id)
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).cast("array<double>").alias("__cv"),
    )
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        cf = c.withColumn("__feat", array_to_vector("__cv"))
        model = KMeans(k=n_clusters, seed=seed, featuresCol="__feat").fit(cf)
        c_assigned = (
            model.transform(cf)
            .withColumnRenamed("prediction", "__cell")
            .drop("__feat")
        )
        centers = [[float(x) for x in ctr] for ctr in model.clusterCenters()]
    else:
        centers = [[float(x) for x in ctr] for ctr in centroids]
        # literal-centroid argmin: first index attaining the min distance
        dists = F.array(
            *[
                l2_distance(
                    F.col("__cv"), F.array(*[F.lit(x) for x in ctr])
                )
                for ctr in centers
            ]
        )
        c_assigned = c.withColumn(
            "__cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )

    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, ctr) for i, ctr in enumerate(centers)],
        "__cell int, __ctr array<double>",
    )
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).cast("array<double>").alias("__qv"),
    )
    qcells = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("__d", l2_distance(F.col("__qv"), F.col("__ctr")))
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("__qid").orderBy(F.col("__d").asc(), F.col("__cell"))
            ),
        )
        .filter(F.col("__r") <= n_probe)
        .select("__qid", "__qv", "__cell")
    )
    scored = (
        qcells.join(c_assigned.select("__cid", "__cv", "__cell"), "__cell", "inner")
        .select(
            F.col("__qid").alias(qname),
            F.col("__cid").alias(cname),
            F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy(qname).orderBy(F.col("cosine").desc(), F.col(cname).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_bucket(
    vec: Column, dim: int, num_planes: int = 8, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id (int in [0, 2^num_planes)).

    Deterministic hyperplanes from ``seed``; bit i is the sign of the
    dot product with plane i.  Pure Column expressions, no shuffle —
    bucketing 100 TB of embeddings is a single map stage.
    """
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, plane_arr) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    dim: int = 64,
    num_planes: int = 8,
    seed: int = 42,
    multi_probe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k via LSH bucketing: equi-join queries to corpus
    on bucket id (plus Hamming-1 neighbor buckets when
    ``multi_probe_bits`` > 0 — boosts recall), exact cosine within the
    probed buckets, window top-k.

    Same output schema as :func:`cosine_topk`; recall < 1 by design.
    """
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).cast("array<double>").alias("__cv"),
        lsh_bucket(F.col(corpus_vec), dim, num_planes, seed).alias("__bucket"),
    )
    qbase = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).cast("array<double>").alias("__qv"),
        lsh_bucket(F.col(query_vec), dim, num_planes, seed).alias("__qb"),
    )
    # multi-probe: also visit buckets that differ in `multi_probe_bits`
    # low bits (flip each of the num_planes bits once)
    probes = [F.col("__qb")]
    if multi_probe_bits > 0:
        probes += [
            F.col("__qb").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)
        ]
    qname, cname = _out_names(query_id, corpus_id)
    q = qbase.withColumn("__bucket", F.explode(F.array(*probes)))
    scored = q.join(c, "__bucket", "inner").select(
        F.col("__qid").alias(qname),
        F.col("__cid").alias(cname),
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    ).dropDuplicates([qname, cname])
    w = Window.partitionBy(qname).orderBy(
        F.col("cosine").desc(), F.col(cname).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
