from .textstats import tokenize, doc_stats, doc_langid, doc_fingerprint, doc_profile, doc_tokens
from .dedup import exact_dedup, ngram_shingles, ngram_jaccard_pairs, minhash_pairs, simhash_fingerprints, simhash_pairs, dedup_clusters
from .similarity import cosine_knn, embedding_neardup_pairs, ivf_ann_knn, kmeans_refine, lsh_ann_knn
from .multimodal import (
    media_schema,
    attach_fake_media,
    attach_real_media,
    decode_media_stats,
    extract_media_features,
    resample_media,
    resize_plan,
    sample_frames,
)
from .pipeline import chunk_documents, hash_sample, normalize_text, pack_sequences, scrub_text, token_quantiles

__all__ = [
    "chunk_documents",
    "dedup_clusters",
    "hash_sample",
    "normalize_text",
    "pack_sequences",
    "scrub_text",
    "token_quantiles",
    "tokenize",
    "doc_stats",
    "doc_profile",
    "doc_langid",
    "doc_fingerprint",
    "doc_tokens",
    "exact_dedup",
    "ngram_shingles",
    "ngram_jaccard_pairs",
    "minhash_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "cosine_knn",
    "embedding_neardup_pairs",
    "ivf_ann_knn",
    "kmeans_refine",
    "lsh_ann_knn",
    "media_schema",
    "attach_fake_media",
    "attach_real_media",
    "decode_media_stats",
    "extract_media_features",
    "resample_media",
    "resize_plan",
    "sample_frames",
]
