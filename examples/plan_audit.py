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

The audit runs at the FIXED sf0.001 dir regardless of the test-session
env override: join-strategy selection depends on size estimates, so the
snapshot is only meaningful against the sf it was recorded at.

    python examples/plan_audit.py [--out plan_audit_last.json]
                                  [--sf-dir /root/testdata/sf0.001]

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

_PATTERNS = {
    "shuffle": re.compile(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)"),
    "broadcast": re.compile(r"\bBroadcastExchange\b"),
    "smj": re.compile(r"\bSortMergeJoin\b"),
    "bhj": re.compile(r"\bBroadcastHashJoin\b"),
    "bnlj": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "cartesian": re.compile(r"\bCartesianProduct\b"),
}


def plan_counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {k: len(p.findall(plan)) for k, p in _PATTERNS.items()}


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
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plan_audit_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-plan-audit", shuffle_partitions=32)
    counts = audit(spark, args.sf_dir, log=lambda m: print(m, file=sys.stderr))
    errors = sorted(n for n, c in counts.items() if "error" in c)
    cartesians = sorted(
        n for n, c in counts.items() if c.get("cartesian", 0) > 0
    )
    rec = {
        "sf_dir": args.sf_dir,
        "n_queries": len(counts),
        "total_shuffles": sum(c.get("shuffle", 0) for c in counts.values()),
        "total_broadcasts": sum(c.get("broadcast", 0) for c in counts.values()),
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
