"""Interleaved A/B probe: ngram_jaccard_pairs pair generation — "grouped"
(one groupBy(sh) + in-row posexplode/slice pair generation, r14 candidate)
vs "selfjoin" (the r1-r13 inverted-index self-join). Asserts identical
sorted results first.

    python examples/probe_ngram_pairgen.py [--rounds 6] [--out f.json]
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
    dedup as dedup_mod,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES

_ORIG = dedup_mod.ngram_jaccard_pairs


def _wrap(mode):
    def f(*args, **kwargs):
        kwargs["pair_gen"] = mode
        return _ORIG(*args, **kwargs)

    return f


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--name", default="ngram_jaccard_top20")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="vlds-probe-ngram-pairgen")
    arms = ("selfjoin", "grouped")

    def set_arm(arm: str) -> None:
        dedup_mod.ngram_jaccard_pairs = _wrap(arm)

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

    rows = {arm: collect_sorted(arm) for arm in arms}
    assert rows["selfjoin"] == rows["grouped"], (
        f"ARMS DIFFER: {len(rows['selfjoin'])} vs {len(rows['grouped'])} rows"
    )
    print(f"# identity: {len(rows['selfjoin'])} rows identical across arms", file=sys.stderr)

    for arm in arms:
        set_arm(arm)
        run_once()
    reps: dict[str, list[float]] = {arm: [] for arm in arms}
    for _ in range(args.rounds):
        for arm in arms:
            set_arm(arm)
            reps[arm].append(run_once())
    dedup_mod.ngram_jaccard_pairs = _ORIG

    out = {arm: {"reps": arr, "min": min(arr)} for arm, arr in reps.items()}
    out["ratio_grouped_vs_selfjoin"] = round(
        out["grouped"]["min"] / out["selfjoin"]["min"], 3
    )
    print(
        f"# selfjoin={out['selfjoin']['min']}s grouped={out['grouped']['min']}s "
        f"ratio={out['ratio_grouped_vs_selfjoin']}",
        file=sys.stderr,
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
