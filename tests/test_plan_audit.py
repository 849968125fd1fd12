"""Structural plan-shape guard (examples/plan_audit.py): wall-clock on
this box is regime-noisy (SCALE.md r11), so the durable per-query
performance signal is the PLAN — shuffle Exchange count, broadcast
count, and join strategy. The committed snapshot (plan_audit_last.json,
recorded at the fixed sf0.001 dir because join selection is
size-estimate-dependent) pins every registry query's node counts; a
diff here means a plan-shape change that must be reviewed and the
snapshot deliberately regenerated, never silent drift."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(_REPO, "examples", "plan_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _snapshot():
    with open(os.path.join(_REPO, "plan_audit_last.json")) as f:
        return json.load(f)


# one representative per family: scan-agg, window, each pipeline, dedup
# (pairs + components), ANN (brute/LSH/IVF), retrieval, packing, sampling,
# streaming batch-twins, TPC-H join shapes
SENTINELS = [
    "pricing_summary",
    "top2_orders_per_customer",
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
    "doc_exact_dedup",
    "minhash_md5_star_dedup",
    "doc_dup_clusters",
    "simhash_md5_near_dups",
    "ngram_jaccard_top20",
    "doc_winnow_fingerprints",
    "embedding_knn_top3",
    "embedding_ann_lsh_top3",
    "embedding_ivf_fixed_top3",
    "ann_recall_at3",
    "bm25_search_top10",
    "hybrid_search_top10",
    "corpus_pack_greedy_512",
    "doc_stratified_sample",
    "events_sessionization",
    "events_trailing_24h_stats",
    "q9_product_profit",
    "q21_latest_shipper",
    "doc_tfidf_top3",
    "doc_feature_hash_embed",
    "embedding_semantic_dedup",
    "doc_pii_redact",
    "doc_quality_report",
]


def test_snapshot_is_complete_and_clean():
    snap = _snapshot()
    assert snap["n_queries"] == len(snap["queries"]) >= 150
    assert snap["errors"] == []
    # a CartesianProduct anywhere is an unconditional scale bug
    assert snap["cartesians"] == []
    for name, c in snap["queries"].items():
        assert "error" not in c, f"{name} errored in the recorded audit"
        assert c["cartesian"] == 0, f"{name} has a CartesianProduct"


def test_sentinel_plans_match_snapshot(spark):
    """Re-derive the sentinel queries' plan shapes live and compare with
    the committed snapshot node-for-node. Runs at the audit's FIXED
    sf0.001 dir (not the session override): join strategy selection is
    size-estimate-dependent, so comparing across sf dirs would diff
    broadcast decisions, not code."""
    pa = _mod()
    snap = _snapshot()["queries"]
    missing = [n for n in SENTINELS if n not in snap]
    assert not missing, f"sentinels absent from snapshot: {missing}"
    live = pa.audit(spark, sf_dir=pa.AUDIT_SF_DIR, names=set(SENTINELS),
                    log=lambda m: None)
    diffs = {
        n: {"snapshot": snap[n], "live": live[n]}
        for n in SENTINELS
        if snap[n] != live[n]
    }
    assert not diffs, (
        "plan shape drifted from the committed snapshot — if the change "
        f"is intentional, regenerate via examples/plan_audit.py: {diffs}"
    )
