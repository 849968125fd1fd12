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
    # ROUND-4 ROTATION: the window (50) holds (a) the 5 pipeline flagships,
    # (b) one representative per operator family (22), and (c) the 23
    # oracled queries that have never seen a driver row
    # (tests/test_registry_window.py R4_PROMOTIONS — the 11 TPC-H
    # silhouettes, 7 lexical/mixing signals, the semantic-dedup pair, and 3
    # event queries). Everything demoted to the tail already has a green
    # driver row in CORRECTNESS_r01/r02/r03 and stays in the local parity
    # suite. After this round, every oracle has had a driver row at least
    # once.
    # -- summarization pipeline flagships (SURVEY §2.4 D1-D17) --------------
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    # -- family representatives (all green in a prior round) ----------------
    "mock_collapse_loop",  # collapse loop (D4-D8)
    "doc_chunk_fixed100",  # chunking (D1)
    "tree_file_hierarchical",  # S3 file source -> D12-D17
    "doc_exact_dedup",  # exact dedup
    "minhash_md5_dedup",  # MinHash+LSH
    "simhash_md5_near_dups",  # SimHash
    "ngram_jaccard_top20",  # n-gram Jaccard verify
    "doc_dup_clusters",  # connected components
    "embedding_knn_top3",  # ANN exact
    "embedding_ann_lsh_top3",  # ANN SRP-LSH
    "ann_recall_at3",  # ANN recall harness
    "multimodal_decode_features",  # multimodal plumbing
    "rouge1_per_doc",  # M1
    "bertscore_mock_pairs",  # M2
    "llm_judge_mock_scores",  # M4/A7
    "bm25_search_top10",  # retrieval
    "doc_repetition_stats",  # text analysis (Gopher)
    "events_tumbling_10min",  # streaming batch twin
    "order_priority_exists_late",  # subquery family
    "doc_split_assign",  # split/sampling
    "corpus_pack_512",  # sequence packing
    "purchase_click_attribution",  # as-of join
    # -- R4 promotions: never driver-checked, each gets its first row now ---
    # lexical / mixing signals (round-3 additions)
    "corpus_top_bigrams",
    "doc_epoch_upsample",
    "doc_char_entropy",
    "doc_tfidf_top3",
    "doc_unigram_logprob",
    "doc_feature_hash_embed",
    "doc_source_quota",
    # semantic dedup / decontamination
    "embedding_split_contamination",
    "embedding_semantic_dedup",
    # event/time-series shapes
    "events_dedup_first_per_minute",
    "events_resample_1h_ffill",
    "events_trailing_24h_stats",
    # TPC-H silhouettes (plans/tpch_extra.py)
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
    # Tail: every other oracle is green in CORRECTNESS_r01/r02/r03 and
    # stays parity-checked locally (tests/test_oracle_parity.py); rows-only
    # showcases (embedding_ivf_top3, bpe_token_counts, minhash/simhash raw
    # twins, doc_winnow_fast, doc_quality_report) ride the tail by design.
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
