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

_PRIORITY = [
    # ROUND-3 ROTATION: the window (50) holds (a) flagships with no other
    # green coverage, (b) the 12 oracled queries that had never seen a
    # driver row in r01/r02, and (c) the round-3 additions (tree file
    # source, ANN recall, greedy packing). r02-green entries whose operator
    # family keeps other green coverage ride the tail — their oracles stay
    # in the local parity suite, and their green r02 rows stand.
    # -- summarization pipeline flagships (SURVEY §2.4 D1-D17) --------------
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    "mock_collapse_loop",
    "doc_chunk_fixed100",
    "tree_file_hierarchical",  # NEW r3: S3 file source -> D12-D17 end-to-end
    # -- dedup / similarity / ANN (north-star LLM-data ops) -----------------
    "doc_exact_dedup",
    "doc_span_dedup",  # NEW r3: C4-style repeated-span removal, oracled
    "ngram_jaccard_top20",
    "minhash_md5_dedup",
    "simhash_md5_near_dups",
    "embedding_near_dups_lsh",
    "embedding_knn_top3",
    "embedding_ann_lsh_top3",
    "embedding_ivf_fixed_top3",  # never driver-checked (r2 addition)
    "ann_recall_at3",  # NEW r3: recall vs exact ground truth, oracled
    "doc_dup_clusters",
    "doc_winnow_fingerprints",  # never driver-checked (r2 addition)
    "multimodal_decode_features",  # r2 ERR row -> now oracled string projection
    "multimodal_decode_dims",
    # -- metric engine (SURVEY §2.9 M1-M5) ----------------------------------
    "rouge1_per_doc",
    "bertscore_mock_pairs",
    "llm_judge_mock_scores",
    # -- text analysis / retrieval ------------------------------------------
    "doc_repetition_stats",
    "doc_pii_redact",  # NEW r3: PII counts + typed redaction, oracled
    "bm25_search_top10",
    "source_name_sanitize",  # never driver-checked (C6/C7)
    # -- relational representatives (window/grouping-sets/set/percentile) ---
    "customer_balance_ranks",
    "lineitem_grouping_sets",  # never driver-checked
    "forecast_revenue_q6",  # never driver-checked (TPC-H Q6)
    "promo_revenue_q14",  # never driver-checked (TPC-H Q14)
    "segment_price_percentiles",  # never driver-checked
    "returnflag_except_all",  # never driver-checked (EXCEPT ALL)
    # -- subquery family (EXISTS / NOT EXISTS / IN / correlated scalar) -----
    "order_priority_exists_late",
    "brand_small_qty_revenue",
    "big_order_customers",
    "dormant_rich_customers",
    "nation_supplier_scalars",  # never driver-checked
    # -- dataset split / packing / decontamination (training-data prep) -----
    "doc_split_assign",
    "doc_stratified_sample",  # never driver-checked
    "corpus_pack_512",
    "corpus_pack_greedy_512",  # NEW r3: hard-budget packing, recursive-CTE oracle
    "doc_contamination_top20",
    "embedding_int8_roundtrip",  # never driver-checked
    # -- as-of join (time-series lookup) ------------------------------------
    "purchase_click_attribution",
    # -- streaming batch twins (§2.10 north star) ---------------------------
    "events_tumbling_10min",
    "events_sessionization",
    "events_click_purchase_pairs",  # never driver-checked
    # Tail (r02-green, other coverage keeps the family checked):
    # embedding_ivf_top3 + bpe_token_counts (rows-only; ivf_fixed/knn and the
    # BPE unit suite keep those families checked),
    # mock_collapse_level, doc_collapse_buckets, doc_greedy_buckets,
    # estimated_chunk_counts, embedding_cosine_pairs_exact,
    # embedding_label_centroids, doc_dedup_survivors, minhash_lsh_dedup,
    # simhash_near_dups, rouge2_per_doc, rouge1_moments_by_lang,
    # rouge1_histogram, best_source_by_quality, customer_order_full_outer,
    # customer_first_last_order, doc_winnow_fast (xxhash twin, bench-only).
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
