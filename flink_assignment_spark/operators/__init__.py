from .asof import asof_join
from .cep import followed_by
from .components import connected_components, dedup_clusters
from .dedup import (
    chunk_occurrences,
    containment_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
    substring_occurrences,
    substring_scrub,
)
from .frequent import heavy_hitters
from .gates import (
    bloom_contaminated_counts,
    build_bloom,
    compression_stats,
    contaminated_counts,
    pii_stats,
    repetition_stats,
)
from .interval_join import bucketed_interval_join, interval_join
from .lm import bigram_lm_scores, export_lm, score_with_broadcast_lm
from .packing import pack_stats
from .sampling import (
    assign_split,
    group_split,
    mixture_rates,
    mixture_rebalance,
    stratified_sample,
    uniform_from_key,
)
from .sessionize import session_stats, sessionize
from .similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_index,
    ivf_probe,
    ivf_topk,
    ivf_train,
    load_centroids,
    lsh_bucketize_self,
    lsh_topk,
    save_centroids,
    semantic_contamination,
)
from .skew import salted_agg, salted_join

__all__ = [
    "asof_join",
    "assign_split",
    "bigram_lm_scores",
    "bloom_contaminated_counts",
    "build_bloom",
    "bucketed_interval_join",
    "chunk_occurrences",
    "compression_stats",
    "connected_components",
    "containment_pairs",
    "contaminated_counts",
    "cosine_neardup_pairs",
    "cosine_topk",
    "dedup_clusters",
    "exact_dedup",
    "export_lm",
    "followed_by",
    "group_split",
    "heavy_hitters",
    "interval_join",
    "ivf_index",
    "ivf_probe",
    "ivf_topk",
    "ivf_train",
    "load_centroids",
    "lsh_bucketize_self",
    "lsh_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "mixture_rates",
    "mixture_rebalance",
    "ngram_jaccard_pairs",
    "pack_stats",
    "pii_stats",
    "repetition_stats",
    "salted_agg",
    "salted_join",
    "save_centroids",
    "score_with_broadcast_lm",
    "semantic_contamination",
    "session_stats",
    "sessionize",
    "simhash_fingerprints",
    "simhash_pairs",
    "stratified_sample",
    "substring_occurrences",
    "substring_scrub",
    "uniform_from_key",
]
