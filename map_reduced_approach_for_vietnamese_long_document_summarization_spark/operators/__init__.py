"""Dataflow operators (SURVEY §2.4 D1-D19 + north-star extensions)."""

from .chunking import chunk_documents, chunk_fixed_tokens, recursive_split_text
from .collapse import bucket_by_token_budget, bucket_running_sum, collapse_until_fits
from .grouped import grouped_apply_sorted
from .dedup import (
    exact_dedup,
    hamming_near_dup_pairs,
    line_dedup,
    lsh_band_table,
    md5_hash32,
    md5_hash60,
    minhash_dedup_pairs,
    minhash_incremental_pairs,
    minhash_lsh_star_candidates,
    minhash_md5_pairs,
    minhash_md5_signatures,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    simhash_signatures,
    span_dedup,
    unpersist_inputs,
    winnowing_fingerprints,
)
from .multimodal import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_media,
    media_average_hash,
    resize_media,
    sample_frames,
)
from .pairing import (
    anti_pairs,
    corpus_diff,
    pair_docs_with_refs,
    positional_zip_join,
    skip_existing,
    skip_existing_bloom,
)
from .similarity import (
    cell_histogram,
    cosine_topk,
    semantic_dedup,
    embedding_near_dup_pairs,
    ivf_assign,
    ivf_build_index,
    ivf_fixed_centroids,
    ivf_topk,
    random_hyperplane_lsh_topk,
)
from .asof import asof_join
from .rollup import ansi_cube, ansi_rollup
from .classifier import (
    fixed_quality_coefficients,
    score_quality,
    train_quality_classifier,
)
from .interval import interval_join
from .components import connected_components, dedup_keep_best, dedup_keep_canonical
from .contamination import ngram_contamination
from .packing import pack_sequences, packing_stats
from .report import corpus_quality_report
from .retrieval import bm25_topk, term_postings
from .timeseries import resample_ffill
from .sampling import (
    assign_split,
    mixture_rates,
    epoch_upsample,
    hash_uniform,
    source_quota_sample,
    stratified_hash_sample,
)
from .skew import salted_agg, salted_join
from .features import feature_hash_embed, to_dense_vector
from .vocab import tfidf_top_terms, top_ngrams, unigram_logprob

__all__ = [
    "ansi_cube",
    "ansi_rollup",
    "asof_join",
    "fixed_quality_coefficients",
    "score_quality",
    "train_quality_classifier",
    "interval_join",
    "connected_components",
    "dedup_keep_best",
    "dedup_keep_canonical",
    "ngram_contamination",
    "bm25_topk",
    "corpus_quality_report",
    "resample_ffill",
    "term_postings",
    "pack_sequences",
    "packing_stats",
    "assign_split",
    "epoch_upsample",
    "mixture_rates",
    "hash_uniform",
    "source_quota_sample",
    "stratified_hash_sample",
    "cell_histogram",
    "semantic_dedup",
    "feature_hash_embed",
    "tfidf_top_terms",
    "to_dense_vector",
    "top_ngrams",
    "unigram_logprob",
    "chunk_documents",
    "chunk_fixed_tokens",
    "recursive_split_text",
    "bucket_by_token_budget",
    "bucket_running_sum",
    "collapse_until_fits",
    "grouped_apply_sorted",
    "anti_pairs",
    "corpus_diff",
    "pair_docs_with_refs",
    "positional_zip_join",
    "skip_existing",
    "skip_existing_bloom",
    "exact_dedup",
    "hamming_near_dup_pairs",
    "line_dedup",
    "lsh_band_table",
    "md5_hash32",
    "md5_hash60",
    "minhash_signatures",
    "minhash_dedup_pairs",
    "minhash_incremental_pairs",
    "minhash_lsh_star_candidates",
    "minhash_md5_signatures",
    "minhash_md5_pairs",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "span_dedup",
    "unpersist_inputs",
    "winnowing_fingerprints",
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_media",
    "media_average_hash",
    "resize_media",
    "sample_frames",
    "cosine_topk",
    "random_hyperplane_lsh_topk",
    "embedding_near_dup_pairs",
    "ivf_build_index",
    "ivf_assign",
    "ivf_fixed_centroids",
    "ivf_topk",
    "salted_agg",
    "salted_join",
]
