from .asof import asof_join
from .cep import followed_by
from .components import connected_components, dedup_clusters
from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from .interval_join import bucketed_interval_join, interval_join
from .sampling import assign_split, stratified_sample, uniform_from_key
from .sessionize import session_stats, sessionize
from .similarity import cosine_neardup_pairs, cosine_topk, ivf_topk, lsh_topk
from .skew import salted_agg, salted_join

__all__ = [
    "asof_join",
    "assign_split",
    "stratified_sample",
    "uniform_from_key",
    "followed_by",
    "connected_components",
    "dedup_clusters",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "interval_join",
    "bucketed_interval_join",
    "session_stats",
    "sessionize",
    "cosine_neardup_pairs",
    "cosine_topk",
    "ivf_topk",
    "lsh_topk",
    "salted_agg",
    "salted_join",
]
