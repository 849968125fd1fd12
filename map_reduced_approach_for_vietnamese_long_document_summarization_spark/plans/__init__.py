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
ROTATION_BASIS_ROUNDS = 12

_PRIORITY = [
    # ROUND-13 ROTATION — STALENESS REFRESH (VERDICT r12 item 4). Basis =
    # CORRECTNESS_r01..r12. The 45 non-flagship slots retire the lone
    # remaining r9 oracle (tree_file_hierarchical) and the 44 stalest of
    # the r10 vintage by name (the training-data curation, embedding, and
    # TPC-H silhouette families refreshed in r10); after r13 goes green no
    # oracle's most recent driver row is older than r10.
    # tests/test_registry_window.py::test_window_prefers_stalest
    # re-derives this exact set from the artifacts;
    # examples/rotate_window.py 12 printed this block.
    # flagships (always in)
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    # -- last green r9 --
    "tree_file_hierarchical",
    # -- last green r10 --
    "big_order_customers",
    "brand_small_qty_revenue",
    "corpus_pack_greedy_512",
    "customer_balance_ranks",
    "doc_char_entropy",
    "doc_epoch_upsample",
    "doc_feature_hash_embed",
    "doc_source_quota",
    "doc_stratified_sample",
    "doc_tfidf_top3",
    "doc_unigram_logprob",
    "dormant_rich_customers",
    "embedding_cosine_pairs_exact",
    "embedding_int8_roundtrip",
    "embedding_ivf_fixed_top3",
    "embedding_label_centroids",
    "embedding_near_dups_lsh",
    "embedding_semantic_dedup",
    "embedding_split_contamination",
    "estimated_chunk_counts",
    "events_click_purchase_pairs",
    "events_dedup_first_per_minute",
    "events_resample_1h_ffill",
    "events_trailing_24h_stats",
    "forecast_revenue_q6",
    "lineitem_grouping_sets",
    "mock_collapse_level",
    "multimodal_decode_dims",
    "nation_supplier_scalars",
    "promo_revenue_q14",
    "q11_important_inventory",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_latest_shipper",
    "q2_min_cost_supplier",
    "q7_nation_trade_volume",
    "q8_market_share",
    "returnflag_except_all",
    "rouge1_histogram",
    "rouge2_per_doc",
    "segment_price_percentiles",
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
