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

_PRIORITY = [
    # -- summarization pipeline flagships (SURVEY §2.4 D1-D17) --------------
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    "mock_collapse_loop",
    "mock_collapse_level",
    "doc_chunk_fixed100",
    "doc_collapse_buckets",
    "doc_greedy_buckets",
    "estimated_chunk_counts",
    # -- dedup / similarity / ANN (north-star LLM-data ops) -----------------
    "doc_exact_dedup",
    "ngram_jaccard_top20",
    "minhash_lsh_dedup",
    "minhash_md5_dedup",
    "simhash_near_dups",
    "simhash_md5_near_dups",
    "embedding_cosine_pairs_exact",
    "embedding_near_dups_lsh",
    "embedding_knn_top3",
    "embedding_ivf_top3",
    "embedding_ann_lsh_top3",
    "embedding_label_centroids",
    "doc_dup_clusters",
    "doc_dedup_survivors",
    "multimodal_decode_features",
    "multimodal_decode_dims",
    # -- metric engine (SURVEY §2.9 M1-M5) ----------------------------------
    "rouge1_per_doc",
    "rouge2_per_doc",
    "rouge1_moments_by_lang",
    "rouge1_histogram",
    "bertscore_mock_pairs",
    "best_source_by_quality",
    "llm_judge_mock_scores",
    "bpe_token_counts",
    # -- text analysis / retrieval -------------------------------------------
    "doc_repetition_stats",
    "bm25_search_top10",
    # doc_stats_by_lang / doc_quality_scores / doc_language_id /
    # doc_clean_thinking / doc_truncate_first50: driver-green in r01,
    # demoted for the round-2 training-pipeline families below
    # -- relational representatives (join/window/set/agg families) ----------
    "customer_order_full_outer",
    "customer_balance_ranks",
    "customer_first_last_order",
    # -- subquery family (EXISTS / NOT EXISTS / IN / correlated scalar) -----
    "order_priority_exists_late",
    "brand_small_qty_revenue",
    "big_order_customers",
    "dormant_rich_customers",
    # -- dataset split / packing / decontamination (training-data prep) -----
    "doc_split_assign",
    "corpus_pack_512",
    "doc_contamination_top20",
    # -- as-of join (time-series lookup) ------------------------------------
    "purchase_click_attribution",
    # -- streaming batch twins (§2.10 north star) ---------------------------
    "events_tumbling_10min",
    "events_sessionization",
    # pricing_summary / top_revenue_orders / shipping_priority_q3 /
    # events_sliding_10m_5m are driver-green in CORRECTNESS_r01.json;
    # demoted past the window (round 2) to make room for the never-checked
    # subquery + split families. nation_top_customer / customer_running_spend
    # / source_name_sanitize / nation_supplier_scalars / doc_stratified_sample
    # ride the tail — all remain in the local parity suite.
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
