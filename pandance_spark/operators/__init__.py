from pandance_spark.operators.asof import asof_join
from pandance_spark.operators.bloom import bloom_dedup, bloom_words
from pandance_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
    graph_summary,
    pagerank,
    triangle_count,
)
from pandance_spark.operators.contamination import contamination_check
from pandance_spark.operators.rollup import (
    build_cms,
    build_rollup,
    cms_lookup,
    finalize_rollup,
    merge_cms,
    merge_rollup,
    time_bucket,
)
from pandance_spark.operators.fuzzy import fuzzy_join
from pandance_spark.operators.ineq import ineq_join
from pandance_spark.operators.merge import merge_upsert, table_diff
from pandance_spark.operators.overlap import merge_intervals, overlap_join
from pandance_spark.operators.scd import scd2_apply, scd2_history
from pandance_spark.operators.sessions import sessionize
from pandance_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    hash_seed_centroids,
    kmeans_assign_exact,
    kmeans_update_exact,
    knn_graph,
    semdedup_pairs,
)
from pandance_spark.operators.skew import salted_join
from pandance_spark.operators.theta import theta_join

__all__ = [
    "build_cms",
    "merge_cms",
    "cms_lookup",
    "triangle_count",
    "graph_summary",
    "hash_seed_centroids",
    "kmeans_assign_exact",
    "kmeans_update_exact",
    "semdedup_pairs",
    "build_rollup",
    "finalize_rollup",
    "merge_rollup",
    "time_bucket",
    "bloom_dedup",
    "bloom_words",
    "fuzzy_join",
    "ineq_join",
    "theta_join",
    "asof_join",
    "connected_components",
    "dedup_clusters",
    "pagerank",
    "merge_intervals",
    "contamination_check",
    "merge_upsert",
    "table_diff",
    "scd2_history",
    "scd2_apply",
    "sessionize",
    "salted_join",
    "overlap_join",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "knn_graph",
]
