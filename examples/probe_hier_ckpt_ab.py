"""Interleaved A/B for the hierarchical aggregate-checkpoint change (r13).

Runs pipeline_hierarchical_mock's exact computation twice per round in one
session — ckpt_aggregates=False (the pre-change plan) vs True (the
single-evaluation checkpoints of the bodies gather and the final per-doc
gather) — so both arms ride the same box-noise profile.

    python examples/probe_hier_ckpt_ab.py [--rounds 4]
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans.relational import (
    _t,
    _two_part_tree_json,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
    hierarchical_summarize,
)


def build(spark, sf_dir: str, ckpt: bool):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    trees = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _two_part_tree_json().alias("tree_json"),
    )
    return hierarchical_summarize(
        trees, MockSummarizer(24), max_depth=1, chunk_size=60,
        chunk_overlap=10, token_max=80, ckpt_aggregates=ckpt,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vlds-probe-hier-ab")

    for mode in (False, True):  # warmup both arms
        build(spark, sf_dir, mode).write.format("noop").mode("overwrite").save()

    reps = {"base": [], "ckpt": []}
    for _ in range(args.rounds):
        for label, mode in (("base", False), ("ckpt", True)):
            spark.catalog.clearCache()
            gc.collect()
            release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
            t0 = time.perf_counter()
            build(spark, sf_dir, mode).write.format("noop").mode("overwrite").save()
            reps[label].append(round(time.perf_counter() - t0, 3))

    out = {k: {"reps": v, "min": min(v)} for k, v in reps.items()}
    out["delta_min"] = round(out["ckpt"]["min"] - out["base"]["min"], 3)
    for k in ("base", "ckpt"):
        print(f"# {k}: min={out[k]['min']}s reps={out[k]['reps']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
