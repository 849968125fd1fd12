"""Interleaved multi-arm probe: lazy seed / round-0-label checkpoints in
``connected_components`` (r14 candidate — guide §2.4/§2.6 "materialize under
the job that reads it anyway") vs the r13 eager-per-stage behavior, on
``doc_dup_clusters``. Arms: eager (both eager), seed (seed lazy only),
label (label lazy only), both. Asserts all arms' full sorted result sets
are identical before timing anything.

    python examples/probe_components_lazy.py [--rounds 5] [--out f.json]
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
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    components as comp,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES

_ORIG = comp.connected_components

ARMS = {
    "eager": {"lazy_seed_ckpt": False, "lazy_label_ckpt": False},
    "seed": {"lazy_seed_ckpt": True, "lazy_label_ckpt": False},
    "label": {"lazy_seed_ckpt": False, "lazy_label_ckpt": True},
    "both": {"lazy_seed_ckpt": True, "lazy_label_ckpt": True},
}


def _wrap(flags):
    def cc(*args, **kwargs):
        merged = dict(flags)
        merged.update(kwargs)
        return _ORIG(*args, **merged)

    return cc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--name", default="doc_dup_clusters")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="vlds-probe-components-lazy")

    def set_arm(arm: str) -> None:
        comp.connected_components = _wrap(ARMS[arm])

    def run_once() -> float:
        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        t0 = time.perf_counter()
        QUERIES[args.name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # identity gate first: full sorted result sets must match between arms
    def collect_sorted(arm: str):
        set_arm(arm)
        spark.catalog.clearCache()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        df = QUERIES[args.name](spark, args.sf_dir)
        return sorted(tuple(r) for r in df.collect())

    rows = {arm: collect_sorted(arm) for arm in ARMS}
    base = rows["eager"]
    for arm, r in rows.items():
        assert r == base, f"ARM {arm} DIFFERS: {len(base)} vs {len(r)} rows"
    print(f"# identity: {len(base)} rows identical across {len(ARMS)} arms", file=sys.stderr)

    for arm in ARMS:  # warm every arm
        set_arm(arm)
        run_once()
    reps: dict[str, list[float]] = {arm: [] for arm in ARMS}
    for _ in range(args.rounds):
        for arm in ARMS:
            set_arm(arm)
            reps[arm].append(run_once())
    comp.connected_components = _ORIG  # restore the committed default

    out = {arm: {"reps": arr, "min": min(arr)} for arm, arr in reps.items()}
    base_min = out["eager"]["min"]
    for arm in ARMS:
        out[arm]["ratio_vs_eager"] = round(out[arm]["min"] / base_min, 3)
    out["identical_rows"] = len(base)
    print(
        " ".join(f"{arm}={out[arm]['min']}s({out[arm]['ratio_vs_eager']}x)" for arm in ARMS),
        file=sys.stderr,
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
