"""Dataflow operators (SURVEY §2.4 D1-D19 + north-star extensions)."""

from .chunking import chunk_documents, chunk_fixed_tokens, recursive_split_text
from .collapse import bucket_by_token_budget, bucket_running_sum, collapse_until_fits
from .pairing import anti_pairs, pair_docs_with_refs, skip_existing

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
]
