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
ROTATION_BASIS_ROUNDS = 6

_PRIORITY = [
    # ROUND-7 ROTATION — STALENESS REFRESH (VERDICT r6 item 1). Basis =
    # CORRECTNESS_r01..r06. The 45 non-flagship slots retire the entire
    # ≤r3 tail: all 6 oracles last green in r2, all 18 last green in r3,
    # and the first 21 of the r4 vintage by name. After r7 goes green no
    # oracle's most recent driver row is older than r4.
    # tests/test_registry_window.py::test_window_prefers_stalest re-derives
    # this exact set from the artifacts; examples/rotate_window.py printed
    # this block.
    # -- summarization pipeline flagships (SURVEY §2.4 D1-D17): always in --
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    # -- last green r2 ------------------------------------------------------
    "embedding_cosine_pairs_exact",
    "embedding_label_centroids",
    "estimated_chunk_counts",
    "mock_collapse_level",
    "rouge1_histogram",
    "rouge2_per_doc",
    # -- last green r3 ------------------------------------------------------
    "big_order_customers",
    "brand_small_qty_revenue",
    "corpus_pack_greedy_512",
    "customer_balance_ranks",
    "doc_stratified_sample",
    "dormant_rich_customers",
    "embedding_int8_roundtrip",
    "embedding_ivf_fixed_top3",
    "embedding_near_dups_lsh",
    "events_click_purchase_pairs",
    "forecast_revenue_q6",
    "lineitem_grouping_sets",
    "multimodal_decode_dims",
    "nation_supplier_scalars",
    "promo_revenue_q14",
    "returnflag_except_all",
    "segment_price_percentiles",
    "source_name_sanitize",
    # -- last green r4 (first 21 by name) -----------------------------------
    "doc_char_entropy",
    "doc_epoch_upsample",
    "doc_feature_hash_embed",
    "doc_source_quota",
    "doc_tfidf_top3",
    "doc_unigram_logprob",
    "embedding_semantic_dedup",
    "embedding_split_contamination",
    "events_dedup_first_per_minute",
    "events_resample_1h_ffill",
    "events_trailing_24h_stats",
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
    # Tail: everything else is r4(+)-fresh and stays parity-checked locally
    # every session (tests/test_oracle_parity.py, 141 oracles); rows-only
    # showcases ride the tail by design. Next-stalest queue for round 8:
    # q9_product_profit, then the r5 vintage.
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
