"""Relational query surface exercised by the correctness harness.

The driver's correctness gate checks (at most) the first ~50 registered
queries, in dict-insertion order. Round 1 registered the five pipeline
flagships, the dedup/ANN family, and the metric engine *after* index 49, so
none of them got a driver row. ``_PRIORITY`` below pins the registration
order so the showcase operators — summarization pipelines, dedup/similarity,
ROUGE/judge/BERTScore metrics — land inside the window; broadly redundant
relational variants (all driver-green in CORRECTNESS_r01.json) are demoted
past it. Names in ``_PRIORITY`` that are not (yet) registered are skipped;
registered names missing from ``_PRIORITY`` keep their original relative
order at the tail.
"""

from .relational import ORACLES, QUERIES
from . import clusters as _clusters  # noqa: F401  (registers its queries)
from . import subqueries as _subqueries  # noqa: F401  (registers its queries)
from . import training as _training  # noqa: F401  (registers its queries)
from . import tpch_extra as _tpch_extra  # noqa: F401  (registers its queries)

# Rounds of CORRECTNESS artifacts this window's staleness ranking was
# computed from (CORRECTNESS_r01..r{N}.json). Bump when re-rotating so the
# policy test re-derives the expected window from the same evidence.
ROTATION_BASIS_ROUNDS = 10

_PRIORITY = [
    # ROUND-11 ROTATION — STALENESS REFRESH (VERDICT r10 item 3). Basis =
    # CORRECTNESS_r01..r10. The 45 non-flagship slots retire the lone
    # remaining r7 oracle (source_name_sanitize) and the 44 stalest of the
    # r8 vintage by name (judge/BERTScore/ROUGE-per-doc/dedup-md5
    # families); after r11 goes green no oracle's most recent driver row
    # is older than r8. tests/test_registry_window.py::
    # test_window_prefers_stalest re-derives this exact set from the
    # artifacts; examples/rotate_window.py 10 printed this block.
    # flagships (always in)
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    # -- last green r7 --
    "source_name_sanitize",
    # -- last green r8 --
    "ann_recall_at3",
    "bertscore_mock_pairs",
    "bm25_search_top10",
    "corpus_diff_status",
    "corpus_mixture_rates",
    "corpus_pack_512",
    "corpus_top_bigrams",
    "doc_bloom_skip_existing",
    "doc_chunk_fixed100",
    "doc_contamination_top20",
    "doc_dedup_keep_best",
    "doc_dup_clusters",
    "doc_exact_dedup",
    "doc_greedy_buckets",
    "doc_length_iqr_outliers",
    "doc_line_dedup",
    "doc_pii_redact",
    "doc_quality_classifier_fixed",
    "doc_quality_report",
    "doc_repetition_stats",
    "doc_script_ratios",
    "doc_span_dedup",
    "doc_split_assign",
    "doc_text_normalize",
    "doc_winnow_fingerprints",
    "embedding_ann_lsh_top3",
    "embedding_knn_top3",
    "events_click_in_purchase_window",
    "events_sessionization",
    "events_tumbling_10min",
    "hybrid_search_top10",
    "llm_judge_mock_scores",
    "media_ahash_near_dups",
    "minhash_md5_dedup",
    "minhash_md5_incremental_dedup",
    "minhash_md5_star_dedup",
    "mock_collapse_loop",
    "multimodal_decode_features",
    "ngram_jaccard_top20",
    "order_priority_exists_late",
    "purchase_click_attribution",
    "q9_product_profit",
    "rouge1_moments_by_lang",
    "rouge1_per_doc",
]


def _reorder() -> None:
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in _PRIORITY]
    for mapping in (QUERIES, ORACLES):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
