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
    # summarization pipelines (D1-D17)
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    # one representative per operator family (rest of each family is green
    # in a prior CORRECTNESS round and stays in the local parity suite)
    "mock_collapse_loop",
    "doc_chunk_fixed100",
    "tree_file_hierarchical",
    "doc_exact_dedup",
    "minhash_md5_dedup",
    "simhash_md5_near_dups",
    "ngram_jaccard_top20",
    "doc_dup_clusters",
    "embedding_knn_top3",
    "embedding_ann_lsh_top3",
    "ann_recall_at3",
    "multimodal_decode_features",
    "rouge1_per_doc",
    "bertscore_mock_pairs",
    "llm_judge_mock_scores",
    "bm25_search_top10",
    "doc_repetition_stats",
    "events_tumbling_10min",
    "order_priority_exists_late",
    "doc_split_assign",
    "corpus_pack_512",
    "purchase_click_attribution",
    # round-5 extra family reps (green in r1-r3; distinct families)
    "doc_span_dedup",
    "doc_contamination_top20",
    "doc_pii_redact",
    "doc_greedy_buckets",
    "events_sessionization",
    "doc_winnow_fingerprints",
    "rouge1_moments_by_lang",
]


# round-5 re-check: the one red r04 row. Hash-only mismatch diagnosed as a
# DuckDB HUGEINT -> pandas float dtype artifact in the ORACLE (engine rows
# verified identical); the oracle now casts sum(c)::BIGINT. Stays in the
# window until the driver records a green row.
RED_RECHECKS = [
    "corpus_top_bigrams",
]


# round-5 promotions: oracled queries added MID-round-4, after the round-4
# window froze. Rotated INTO the round-5 window so each gets its first
# driver row. test_round5_promotions_inside_window enforces the rotation
# landed.
R5_PROMOTIONS = [
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
    "doc_quality_report",  # rows-only until r4; now fully oracled
    "media_ahash_near_dups",
    "corpus_diff_status",
    "doc_quality_classifier_fixed",
]


# round-6 window candidates: oracled queries added MID-round-5, after the
# round-5 window froze. Round 5 is a registry-catch-up round (VERDICT r4
# item 7): net-new entries are rows-only production twins, so this list
# should stay empty unless a mid-round oracled query genuinely lands. The
# orphan test exempts exactly this list, so the rotation chore can never
# silently backlog.
#
# ROUND-6 ROTATION PLAN: if CORRECTNESS_r05 lands 50/50 green, every
# oracle has a driver row and the catch-up is complete. From round 6 on,
# the window = flagships + any new promotions + the OLDEST-green rows
# (refresh r01/r02 rows first — their green predates the dtype-kind
# parity hardening and several operator rewrites).
R6_PROMOTIONS: list = []


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


def test_round5_promotions_inside_window():
    window = list(QUERIES)[:WINDOW]
    missing = [n for n in R5_PROMOTIONS + RED_RECHECKS if n not in window]
    assert not missing, f"never-driver-green queries still outside: {missing}"


def test_window_is_exactly_full():
    """5 flagship pipelines + 29 family representatives + 15 promotions +
    1 red re-check must fill the window exactly — an underfull window
    wastes driver checks, an overfull one silently evicts the back of the
    list."""
    window = list(QUERIES)[:WINDOW]
    expected = set(FLAGSHIPS) | set(R5_PROMOTIONS) | set(RED_RECHECKS)
    assert len(expected) == WINDOW
    assert set(window) == expected, (
        f"unexpected in window: {sorted(set(window) - expected)}; "
        f"missing: {sorted(expected - set(window))}"
    )


def test_every_oracled_query_has_a_driver_row_somewhere():
    """Window-capacity hygiene: no oracled query may sit outside EVERY
    window — it must have a green row in a past round's CORRECTNESS file,
    be inside the current first-50 (so the coming round checks it), or be
    explicitly queued in R6_PROMOTIONS for the next rotation. A new
    oracled query registered anywhere else fails here immediately, so the
    rotation chore can never silently backlog."""
    window = set(list(QUERIES)[:WINDOW])
    covered = _driver_checked_names() | window | set(R6_PROMOTIONS)
    orphans = sorted(set(ORACLES) - covered)
    assert not orphans, f"oracled queries never driver-checked: {orphans}"


def test_promotion_candidates_are_oracled():
    """Every promotion candidate must exist and carry an oracle — and once
    one gains a green driver row, the next rotation drops it from the
    promotions list so the orphan exemption doesn't outlive its purpose."""
    for n in R5_PROMOTIONS + R6_PROMOTIONS + RED_RECHECKS:
        assert n in QUERIES, f"promotion candidate {n} not registered"
        assert n in ORACLES, f"promotion candidate {n} has no oracle"


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
