from .aggregate import build_partials, merge_partials, tdigest_agg, tdigest_rollup
from .ann import cosine_topk, cosine_topk_sql, lsh_ann_topk
from .dedup import (
    dedup_exact_keep_first,
    dedup_exact_stats,
    embedding_similar_pairs,
    minhash_jaccard_dedup,
    minhash_jaccard_dedup_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    minhash_signatures,
    minhash_signature_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
    simhash_candidate_pairs,
    simhash_signatures,
)
from .multimodal import binary_features, decode_media, frame_sample

__all__ = [
    "build_partials",
    "merge_partials",
    "tdigest_agg",
    "tdigest_rollup",
    "cosine_topk",
    "cosine_topk_sql",
    "lsh_ann_topk",
    "dedup_exact_keep_first",
    "dedup_exact_stats",
    "embedding_similar_pairs",
    "minhash_jaccard_dedup",
    "minhash_jaccard_dedup_sql",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_sql",
    "minhash_signatures",
    "minhash_signature_sql",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_sql",
    "simhash_candidate_pairs",
    "simhash_signatures",
    "binary_features",
    "decode_media",
    "frame_sample",
]
