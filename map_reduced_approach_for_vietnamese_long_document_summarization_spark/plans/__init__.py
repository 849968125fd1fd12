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
ROTATION_BASIS_ROUNDS = 11

_PRIORITY = [
    # ROUND-12 ROTATION — STALENESS REFRESH (VERDICT r11 item 2). Basis =
    # CORRECTNESS_r01..r11. The 45 non-flagship slots retire the lone
    # remaining r8 oracle (simhash_md5_near_dups) and the 44 stalest of
    # the r9 vintage by name (the relational/TPC-H silhouette and
    # doc-stats families refreshed in r9); after r12 goes green no
    # oracle's most recent driver row is older than r9.
    # tests/test_registry_window.py::test_window_prefers_stalest
    # re-derives this exact set from the artifacts;
    # examples/rotate_window.py 11 printed this block.
    # flagships (always in)
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    # -- last green r8 --
    "simhash_md5_near_dups",
    # -- last green r9 --
    "best_source_by_quality",
    "cheapest_parts",
    "customer_first_last_order",
    "customer_order_full_outer",
    "customer_running_spend",
    "customers_with_orders",
    "customers_without_orders",
    "doc_clean_thinking",
    "doc_collapse_buckets",
    "doc_dedup_survivors",
    "doc_keyword_mentions",
    "doc_language_id",
    "doc_quality_scores",
    "doc_stats_by_lang",
    "doc_truncate_first50",
    "events_json_key_counts",
    "events_json_props",
    "events_sliding_10m_5m",
    "events_user_pivot",
    "lang_source_roster",
    "late_shipment_counts",
    "local_supplier_volume_q5",
    "monthly_order_volume",
    "nation_foreign_regions",
    "nation_top_customer",
    "order_gap_days",
    "orders_in_trailing_90d",
    "part_both_flags_all",
    "part_heavy_and_light",
    "part_heavy_only",
    "price_histogram",
    "pricing_summary",
    "priority_distinct_customers",
    "priority_slices_union",
    "region_customer_stats",
    "region_nation_rollup",
    "returned_item_customers_q10",
    "returnflag_cube",
    "returnflag_metrics_unpivot",
    "salted_priority_counts",
    "scalar_function_showcase",
    "segment_stats",
    "shipping_priority_q3",
    "top2_orders_per_customer",
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
