"""Interleaved A/B probe: decoupled-width tree parse in
``hierarchical_summarize`` (r14 candidate): spread the per-tree Python JSON
parse to defaultParallelism, then shuffle the parsed node table back to the
input's natural width before the checkpoint — vs the committed single-task
parse. r13's probe showed the NAIVE spread (wide parse AND wide checkpoint)
loses because the collapse loop's ~6 small driver jobs pay the wide
checkpoint every level; this probe measures the decoupled shape. Asserts
identical sorted results first.

    python examples/probe_hier_parse_spread.py [--rounds 6] [--out f.json]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    hierarchical as hier_mod,
)

_ORIG = hier_mod.hierarchical_summarize

ARMS = {
    "base": {"spread_parse": False},
    "spread": {"spread_parse": True},
}


def _wrap(flags):
    def f(*args, **kwargs):
        merged = dict(flags)
        merged.update(kwargs)
        return _ORIG(*args, **merged)

    return f


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--name", default="pipeline_hierarchical_mock")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="vlds-probe-hier-parse")

    def set_arm(arm: str) -> None:
        # the plan module imports the name from ..summarize at call time
        import map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize as s

        s.hierarchical_summarize = _wrap(ARMS[arm])

    def run_once() -> float:
        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        t0 = time.perf_counter()
        QUERIES[args.name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def collect_sorted(arm: str):
        set_arm(arm)
        spark.catalog.clearCache()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        return sorted(tuple(r) for r in QUERIES[args.name](spark, args.sf_dir).collect())

    rows = {arm: collect_sorted(arm) for arm in ARMS}
    for arm, r in rows.items():
        assert r == rows["base"], f"ARM {arm} DIFFERS"
    print(f"# identity: {len(rows['base'])} rows identical across arms", file=sys.stderr)

    for arm in ARMS:
        set_arm(arm)
        run_once()
    reps: dict[str, list[float]] = {arm: [] for arm in ARMS}
    for _ in range(args.rounds):
        for arm in ARMS:
            set_arm(arm)
            reps[arm].append(run_once())
    import map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize as s

    s.hierarchical_summarize = _ORIG

    out = {arm: {"reps": arr, "min": min(arr)} for arm, arr in reps.items()}
    base_min = out["base"]["min"]
    for arm in ARMS:
        out[arm]["ratio_vs_base"] = round(out[arm]["min"] / base_min, 3)
    print(
        " ".join(f"{arm}={out[arm]['min']}s({out[arm]['ratio_vs_base']}x)" for arm in ARMS),
        file=sys.stderr,
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
