"""The driver's correctness gate checks the FIRST 50 registered queries
(round-1 lesson: everything after index 49 got no driver row; the r02
CORRECTNESS file confirms the cap is exactly 50). Pin the window's
composition so future registrations can't silently evict the flagship
operators, dilute oracle coverage, or land an oracled query outside every
round's window."""

import json
import os

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import ORACLES, QUERIES

WINDOW = 50  # the driver checks exactly this many entries (CORRECTNESS_r02)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIPS = [
    # summarization pipelines (D1-D17) + the S3 file-source path
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    "mock_collapse_loop",
    "tree_file_hierarchical",
    # dedup / similarity / ANN north star
    "doc_exact_dedup",
    "doc_span_dedup",
    "doc_pii_redact",
    "ngram_jaccard_top20",
    "minhash_md5_dedup",
    "simhash_md5_near_dups",
    "embedding_knn_top3",
    "embedding_ann_lsh_top3",
    "embedding_ivf_fixed_top3",
    "ann_recall_at3",
    "embedding_near_dups_lsh",
    "doc_dup_clusters",
    "multimodal_decode_features",
    "multimodal_decode_dims",
    # metric engine (M1-M5)
    "rouge1_per_doc",
    "bertscore_mock_pairs",
    "llm_judge_mock_scores",
    # streaming batch twins (§2.10)
    "events_tumbling_10min",
    "events_sessionization",
    # subquery family (EXISTS / IN / correlated scalar / NOT EXISTS)
    "order_priority_exists_late",
    "brand_small_qty_revenue",
    "big_order_customers",
    "dormant_rich_customers",
    # training-data prep (split / packing / decontamination / retrieval)
    "doc_split_assign",
    "corpus_pack_512",
    "corpus_pack_greedy_512",
    "doc_contamination_top20",
    "bm25_search_top10",
    # as-of join
    "purchase_click_attribution",
]

# round-3 promotions: oracled queries that had NO driver row in r01/r02
# (VERDICT r2 "What's missing" #1) plus the round-3 additions — the whole
# point of the rotation is that each of these gets a driver row this round
R3_PROMOTIONS = [
    "events_click_purchase_pairs",
    "lineitem_grouping_sets",
    "forecast_revenue_q6",
    "promo_revenue_q14",
    "source_name_sanitize",
    "segment_price_percentiles",
    "returnflag_except_all",
    "doc_winnow_fingerprints",
    "embedding_ivf_fixed_top3",
    "embedding_int8_roundtrip",
    "nation_supplier_scalars",
    "doc_stratified_sample",
    "ann_recall_at3",
    "tree_file_hierarchical",
    "corpus_pack_greedy_512",
    "doc_span_dedup",
    "doc_pii_redact",
]


# round-4 window candidates: oracled queries ADDED mid-round-3, after the
# round-3 window was frozen (evicting a frozen entry would un-check a
# promotion). They ride the tail this round — locally parity-checked only —
# and MUST be rotated into the round-4 window. test_r4_candidates_are_oracled
# keeps them from rotting; the orphan test below exempts exactly this list.
R4_PROMOTIONS = [
    "corpus_top_bigrams",
    "doc_epoch_upsample",
    "doc_char_entropy",
    "doc_tfidf_top3",
    "doc_unigram_logprob",
    "doc_feature_hash_embed",
    "doc_source_quota",
    "embedding_split_contamination",
    "embedding_semantic_dedup",
    "events_dedup_first_per_minute",
    "events_resample_1h_ffill",
    "events_trailing_24h_stats",
    # plans/tpch_extra.py — the remaining TPC-H silhouettes
    "q2_min_cost_supplier",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_inventory",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_latest_shipper",
]


def _driver_checked_names():
    """Names with a GREEN driver row in any prior round's CORRECTNESS file.
    err rows (e.g. multimodal_decode_features' r02 canonicalizer crash) and
    mismatching rows don't count — a query that only ever crashed the
    driver must stay in (or return to) the window until it goes green."""
    seen = set()
    for fn in sorted(os.listdir(_REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(_REPO, fn)) as f:
                for name, row in json.load(f).items():
                    if row.get("err") is None and row.get("hash_match"):
                        seen.add(name)
    return seen


def test_flagships_inside_driver_window():
    window = list(QUERIES)[:WINDOW]
    missing = [n for n in FLAGSHIPS if n not in window]
    assert not missing, f"flagships outside the driver window: {missing}"


def test_round3_promotions_inside_window():
    window = list(QUERIES)[:WINDOW]
    missing = [n for n in R3_PROMOTIONS if n not in window]
    assert not missing, f"never-driver-checked queries still outside: {missing}"


def test_every_oracled_query_has_a_driver_row_somewhere():
    """No oracled query may sit outside EVERY window: it must either have a
    green row in a past round's CORRECTNESS file or be inside the current
    first-50 (so the coming round checks it). Fails when a new oracled
    query silently lands outside all windows."""
    window = set(list(QUERIES)[:WINDOW])
    covered = _driver_checked_names() | window | set(R4_PROMOTIONS)
    orphans = sorted(set(ORACLES) - covered)
    assert not orphans, f"oracled queries never driver-checked: {orphans}"


def test_r4_candidates_are_oracled():
    """Every round-4 promotion candidate must exist and carry an oracle —
    and once one gains a green driver row, drop it from R4_PROMOTIONS so
    the orphan exemption doesn't outlive its purpose."""
    for n in R4_PROMOTIONS:
        assert n in QUERIES, f"R4 candidate {n} not registered"
        assert n in ORACLES, f"R4 candidate {n} has no oracle"


def test_window_oracle_density():
    window = list(QUERIES)[:WINDOW]
    oracled = [n for n in window if n in ORACLES]
    # round 3: every window entry carries an oracle (the rows-only
    # showcases — embedding_ivf_top3, bpe_token_counts, minhash/simhash raw
    # twins, doc_winnow_fast — ride the tail; their oracled twins are green)
    assert len(oracled) == len(window), (
        f"rows-only entries in window: {sorted(set(window) - set(oracled))}"
    )


def test_every_oracled_name_is_registered():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 25
