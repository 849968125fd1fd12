"""Interleaved A/B probe: ann_recall_at3 with the committed
``checkpoint_concurrently`` (threaded subplan materialization, r13 change 4)
vs sequential eager localCheckpoints — the VERDICT r13 item-5 re-check: the
driver's r13 run showed the threading flat (4.3 -> 4.0s), and the change
costs plan-audit visibility; keep it only if it reproduces a win on the
driver's own protocol.

    python examples/probe_ann_threaded.py [--rounds 6] [--out f.json]
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
    _ckpt,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES

_ORIG = _ckpt.checkpoint_concurrently


def _sequential(dfs, max_workers: int = 4):
    return [df.localCheckpoint(eager=True) for df in dfs]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--name", default="ann_recall_at3")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="vlds-probe-ann-threaded")

    def set_arm(arm: str) -> None:
        _ckpt.checkpoint_concurrently = _ORIG if arm == "threaded" else _sequential

    def run_once() -> float:
        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        t0 = time.perf_counter()
        QUERIES[args.name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # identity gate
    def collect_sorted(arm: str):
        set_arm(arm)
        spark.catalog.clearCache()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        return sorted(tuple(r) for r in QUERIES[args.name](spark, args.sf_dir).collect())

    a, b = collect_sorted("sequential"), collect_sorted("threaded")
    assert a == b, f"ARMS DIFFER: {len(a)} vs {len(b)} rows"
    print(f"# identity: {len(a)} rows identical across arms", file=sys.stderr)

    for arm in ("sequential", "threaded"):
        set_arm(arm)
        run_once()
    reps: dict[str, list[float]] = {"sequential": [], "threaded": []}
    for _ in range(args.rounds):
        for arm in ("sequential", "threaded"):
            set_arm(arm)
            reps[arm].append(run_once())
    _ckpt.checkpoint_concurrently = _ORIG  # restore

    out = {arm: {"reps": arr, "min": min(arr)} for arm, arr in reps.items()}
    out["ratio_threaded_vs_seq"] = round(
        out["threaded"]["min"] / out["sequential"]["min"], 3
    )
    print(
        f"# sequential={out['sequential']['min']}s threaded={out['threaded']['min']}s "
        f"ratio={out['ratio_threaded_vs_seq']}",
        file=sys.stderr,
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
