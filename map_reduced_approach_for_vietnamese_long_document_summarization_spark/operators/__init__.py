"""Dataflow operators (SURVEY §2.4 D1-D19 + north-star extensions)."""

from .chunking import chunk_documents, chunk_fixed_tokens, recursive_split_text
from .collapse import bucket_by_token_budget, bucket_running_sum, collapse_until_fits
from .dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .pairing import anti_pairs, pair_docs_with_refs, skip_existing
from .similarity import cosine_topk, random_hyperplane_lsh_topk

__all__ = [
    "chunk_documents",
    "chunk_fixed_tokens",
    "recursive_split_text",
    "bucket_by_token_budget",
    "bucket_running_sum",
    "collapse_until_fits",
    "anti_pairs",
    "pair_docs_with_refs",
    "skip_existing",
    "exact_dedup",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "cosine_topk",
    "random_hyperplane_lsh_topk",
]
