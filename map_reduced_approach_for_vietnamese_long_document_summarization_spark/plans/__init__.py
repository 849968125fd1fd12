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
    # ROUND-5 ROTATION: the window (50) holds (a) the 5 pipeline flagships,
    # (b) one representative per operator family (22 + 7 extra reps from
    # the green pool), (c) the 15 R5_PROMOTIONS — oracled queries that
    # landed after the round-4 window froze — and (d) corpus_top_bigrams,
    # the one red r04 row (hash-only oracle-dtype artifact, oracle fixed
    # this round with ::BIGINT), back for its green re-check. Everything
    # demoted to the tail has a green driver row in CORRECTNESS_r01-r04
    # and stays in the local parity suite. Once this window goes green,
    # EVERY oracle in the registry has a green driver row.
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
    # -- extra family reps (green in r1-r3, distinct families) --------------
    "doc_span_dedup",  # span dedup (C4 windows)
    "doc_contamination_top20",  # n-gram decontamination
    "doc_pii_redact",  # PII redaction
    "doc_greedy_buckets",  # size-bounded grouping (D5)
    "events_sessionization",  # gap sessionization
    "doc_winnow_fingerprints",  # winnowing fingerprints
    "rouge1_moments_by_lang",  # metric moments (A2/A3)
    # -- R5 promotions: oracled mid-round-4, first driver row now ----------
    "corpus_mixture_rates",
    "doc_bloom_skip_existing",
    "doc_text_normalize",
    "doc_dedup_keep_best",
    "doc_line_dedup",
    "events_click_in_purchase_window",
    "minhash_md5_star_dedup",
    "doc_script_ratios",
    "doc_length_iqr_outliers",
    "minhash_md5_incremental_dedup",
    "hybrid_search_top10",
    "doc_quality_report",
    "media_ahash_near_dups",
    "corpus_diff_status",
    "doc_quality_classifier_fixed",
    # -- red re-check: r04 hash-only mismatch, oracle ::BIGINT cast fixed ---
    "corpus_top_bigrams",
    # Tail: every other oracle is green in CORRECTNESS_r01-r04 and stays
    # parity-checked locally (tests/test_oracle_parity.py); rows-only
    # showcases (embedding_ivf_top3, bpe_token_counts, minhash/simhash raw
    # twins, doc_winnow_fast, minhash_star_fast, minhash_incremental_fast)
    # ride the tail by design.
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
