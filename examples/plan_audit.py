"""Structural plan audit: shuffle/broadcast/join-node counts per query.

The r11 probes established that wall-clock on this box is REGIME-noisy
(SCALE.md: alloc-heavy shapes drift 1.3-1.8x with the code untouched).
The durable per-query performance signal is the PLAN: a query that gains
an Exchange has regressed at 100 TB whatever the stopwatch says, and a
broadcast join that silently becomes a sort-merge join is a real
scale-plan change even when sf0.001 timings can't see it. This harness
counts the structural nodes of every registry query's physical plan and
records them; `tests/test_plan_audit.py` compares the live counts
against the committed snapshot, so any plan-shape change must be an
INTENTIONAL, reviewed regeneration instead of a silent drift.

Counted per query (from the pre-execution physical plan — under AQE this
is the rule-based initial plan, deterministic for a fixed sf dir and
shuffle-partition config):

* ``shuffle``   — ``Exchange hashpartitioning/rangepartitioning/
                  SinglePartition`` (the node that costs at 100 TB)
* ``broadcast`` — ``BroadcastExchange``
* ``smj/bhj/bnlj/cartesian`` — join strategy nodes; a CartesianProduct
  anywhere is a hard error (none is ever expected), and bhj->smj flips
  show up as snapshot diffs.
* ``scans/scan_cols/scans_with_pushdown`` (round 12) — parquet scan
  count, TOTAL columns read across them, and scans carrying at least one
  pushed-down filter, extracted by a JVM plan-tree walk (the plan string
  truncates ReadSchema). Column pruning and predicate pushdown are the
  scan-side half of the 100 TB story; a query that silently starts
  reading whole rows now diffs against the snapshot.

The audit runs at the FIXED sf0.001 dir regardless of the test-session
env override: join-strategy selection depends on size estimates, so the
snapshot is only meaningful against the sf it was recorded at.

Because join selection is size-dependent, the sf0.001 snapshot alone is
blind to flips that only manifest at scale — at sf0.001 Catalyst's size
estimates make EVERYTHING broadcastable (VERDICT r11 item 3). A second
snapshot at sf0.1 (the bench's own scale) is therefore recorded for the
SENTINELS subset; tests/test_plan_audit.py pins the cross-sf shape
differences to a reviewed expectation and re-derives the cheap
join-sensitive sentinels live at sf0.1.

    python examples/plan_audit.py [--out plan_audit_last.json]
                                  [--sf-dir /root/testdata/sf0.001]
                                  [--names sentinels|name1,name2,...]

Regenerate the snapshot (and review the diff!) after deliberate plan
changes; exit 1 if any query errors or contains a CartesianProduct.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT_SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.1"

# One representative per family: scan-agg, window, each pipeline, dedup
# (pairs + components), ANN (brute/LSH/IVF), retrieval, packing, sampling,
# streaming batch-twins, TPC-H join shapes. The sf0.1 snapshot
# (plan_audit_sf01.json) covers exactly this set; tests/test_plan_audit.py
# imports it for both guards.
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

_PATTERNS = {
    "shuffle": re.compile(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)"),
    "broadcast": re.compile(r"\bBroadcastExchange\b"),
    "smj": re.compile(r"\bSortMergeJoin\b"),
    "bhj": re.compile(r"\bBroadcastHashJoin\b"),
    "bnlj": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "cartesian": re.compile(r"\bCartesianProduct\b"),
}


def scan_profile(df) -> dict:
    """Scan-shape profile via a JVM plan-tree walk: how many parquet file
    scans the plan has, the TOTAL number of columns they read, and how
    many of them carry at least one pushed-down filter. This is the
    column-pruning / predicate-pushdown leg of the 100 TB story — a scan
    reading 16 columns for a 2-column projection is a real regression the
    exchange counts can't see. The tree walk (not the plan string) is
    deliberate: toString() TRUNCATES ReadSchema past ~100 chars, so
    regex-counting columns from it would lie on wide tables."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        # AQE wraps the whole tree and exposes NO children to
        # collectLeaves; the pre-execution rule-based plan is the member
        plan = plan.initialPlan()
    leaves = plan.collectLeaves()
    n_scans = n_cols = n_pushed = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.getClass().getSimpleName() != "FileSourceScanExec":
            continue  # LocalTableScan / driver literals: no file read
        n_scans += 1
        n_cols += node.output().size()
        meta = node.metadata()
        if meta.contains("PushedFilters"):
            pf = meta.apply("PushedFilters")
            if pf and pf != "[]":
                n_pushed += 1
    return {"scans": n_scans, "scan_cols": n_cols,
            "scans_with_pushdown": n_pushed}


def plan_counts(df) -> dict:
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    out = {k: len(p.findall(plan_str)) for k, p in _PATTERNS.items()}
    out.update(scan_profile(df))
    return out


def audit(spark, sf_dir: str = AUDIT_SF_DIR, names=None, log=print) -> dict:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        persistent_rdd_ids,
        release_rdds,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
        QUERIES,
    )

    out: dict = {}
    for name, fn in QUERIES.items():
        if names is not None and name not in names:
            continue
        try:
            counts = plan_counts(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — recorded, fails the run
            out[name] = {"error": str(e).split("\n")[0][:200]}
            log(f"# {name}: ERROR {out[name]['error'][:100]}")
            continue
        out[name] = counts
        # loop-driven queries (collapse/components/hierarchical) persist
        # and checkpoint during CONSTRUCTION — release between queries so
        # the audit session doesn't accumulate executor memory
        spark.catalog.clearCache()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext),
                     blocking=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=AUDIT_SF_DIR)
    ap.add_argument("--out", default=None,
                    help="snapshot path (default: the full-registry "
                         "plan_audit_last.json; REQUIRED when --names is "
                         "set, so a subset run can never silently "
                         "overwrite the full-registry baseline)")
    ap.add_argument("--names", default=None,
                    help="'sentinels' or a comma-separated query subset "
                         "(default: the full registry)")
    args = ap.parse_args()
    names = None
    if args.names == "sentinels":
        names = set(SENTINELS)
    elif args.names:
        names = set(args.names.split(","))
    if args.out is None:
        if names is not None:
            ap.error("--names audits a SUBSET; pass an explicit --out so it "
                     "cannot overwrite the full-registry plan_audit_last.json")
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plan_audit_last.json")

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-plan-audit", shuffle_partitions=32)
    counts = audit(spark, args.sf_dir, names=names,
                   log=lambda m: print(m, file=sys.stderr))
    errors = sorted(n for n, c in counts.items() if "error" in c)
    cartesians = sorted(
        n for n, c in counts.items() if c.get("cartesian", 0) > 0
    )
    rec = {
        "sf_dir": args.sf_dir,
        "n_queries": len(counts),
        "total_shuffles": sum(c.get("shuffle", 0) for c in counts.values()),
        "total_broadcasts": sum(c.get("broadcast", 0) for c in counts.values()),
        "total_scan_cols": sum(c.get("scan_cols", 0) for c in counts.values()),
        "errors": errors,
        "cartesians": cartesians,
        "queries": counts,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: rec[k] for k in
                      ("n_queries", "total_shuffles", "total_broadcasts",
                       "errors", "cartesians")}))
    if errors or cartesians:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
