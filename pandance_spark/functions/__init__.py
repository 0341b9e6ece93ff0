from pandance_spark.functions.lm import (
    bigram_counts,
    lm_cross_entropy,
    lm_cross_entropy_bigram,
    unigram_counts,
)
from pandance_spark.functions.dsir import (
    dsir_scores,
    dsir_select,
    dsir_weights,
    hashed_feature_counts,
)
from pandance_spark.functions.ranking import bm25_topk, keywords_tfidf
from pandance_spark.functions.split import (
    cap_per_group,
    pack_documents,
    stratified_sample,
    split_train_test,
    temperature_sample,
    token_budget_cap,
)
from pandance_spark.functions.text import (
    char_ngram_fingerprints,
    fingerprint_md5,
    gopher_signals,
    lang_id,
    with_lang_id,
    quality_score,
    redact_pii,
    repetition_profile,
    tag_topics,
    token_count,
    tokenize,
)
from pandance_spark.functions.vectors import (
    cosine_similarity,
    dot,
    embedding_centroids,
    l2_normalize,
)

__all__ = [
    "bm25_topk",
    "keywords_tfidf",
    "tag_topics",
    "token_budget_cap",
    "dsir_scores",
    "dsir_select",
    "dsir_weights",
    "hashed_feature_counts",
    "bigram_counts",
    "lm_cross_entropy",
    "lm_cross_entropy_bigram",
    "unigram_counts",
    "cap_per_group",
    "pack_documents",
    "stratified_sample",
    "split_train_test",
    "temperature_sample",
    "char_ngram_fingerprints",
    "fingerprint_md5",
    "gopher_signals",
    "lang_id",
    "with_lang_id",
    "quality_score",
    "redact_pii",
    "repetition_profile",
    "token_count",
    "tokenize",
    "cosine_similarity",
    "dot",
    "embedding_centroids",
    "l2_normalize",
]
