"""The driver's correctness gate checks the FIRST ~50 registered queries
(round-1 lesson: everything after index 49 got no driver row). Pin the
window's composition so future registrations can't silently evict the
flagship operators or dilute oracle coverage."""

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import ORACLES, QUERIES

WINDOW = 50

FLAGSHIPS = [
    # summarization pipelines (D1-D17)
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    "mock_collapse_loop",
    # dedup / similarity / ANN north star
    "doc_exact_dedup",
    "ngram_jaccard_top20",
    "minhash_lsh_dedup",
    "minhash_md5_dedup",
    "simhash_near_dups",
    "simhash_md5_near_dups",
    "embedding_knn_top3",
    "embedding_ann_lsh_top3",
    "embedding_ivf_top3",
    "embedding_near_dups_lsh",
    "multimodal_decode_dims",
    # metric engine (M1-M5)
    "rouge1_per_doc",
    "rouge2_per_doc",
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
    "doc_contamination_top20",
    "bm25_search_top10",
    # as-of join
    "purchase_click_attribution",
]


def test_flagships_inside_driver_window():
    window = list(QUERIES)[:WINDOW]
    missing = [n for n in FLAGSHIPS if n not in window]
    assert not missing, f"flagships outside the driver window: {missing}"


def test_window_oracle_density():
    window = list(QUERIES)[:WINDOW]
    oracled = [n for n in window if n in ORACLES]
    # every rows-only entry must have a reason (hash family / model-backed /
    # float32 arrays) AND an oracle-checked twin registered in the window
    assert len(oracled) >= 44, f"only {len(oracled)} oracled in window"
    rows_only = set(window) - set(oracled)
    allowed = {
        "minhash_lsh_dedup",       # twin: minhash_md5_dedup
        "simhash_near_dups",       # twin: simhash_md5_near_dups
        "embedding_ivf_top3",      # k-means is iterative; twin: embedding_knn_top3
        "multimodal_decode_features",  # float32 arrays; twin: multimodal_decode_dims
        "bpe_token_counts",        # vendored BPE merges aren't SQL-expressible
    }
    assert rows_only <= allowed, f"unexpected rows-only entries: {rows_only - allowed}"


def test_every_oracled_name_is_registered():
    assert set(ORACLES) <= set(QUERIES)
