"""Metric engine (SURVEY §2.9 M1-M5, §2.5 A2/A4/A5).

Deterministic metrics (ROUGE, cosine) are first-class and always available;
model-backed metrics (BERTScore, G-Eval) are pluggable interfaces gated
behind import-tries — network/services are not assumed (SURVEY §7 stage 6).
"""

from .rouge import rouge_scores_udf, rouge1_f1_expr
from .semantic import cosine_similarity_expr
from .aggregate import best_by_metric, metric_moments, similarity_histogram
from .bertscore import (
    bertscore_corpus_mean,
    bertscore_greedy_pairs,
    bertscore_hard_match,
    hashed_trigram_encoder,
    one_hot_bucket_encoder,
)

__all__ = [
    "rouge_scores_udf",
    "rouge1_f1_expr",
    "cosine_similarity_expr",
    "metric_moments",
    "similarity_histogram",
    "best_by_metric",
    "bertscore_hard_match",
    "bertscore_greedy_pairs",
    "bertscore_corpus_mean",
    "hashed_trigram_encoder",
    "one_hot_bucket_encoder",
]
