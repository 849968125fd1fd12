"""Interleaved A/B: parallelize the hierarchical flatten's Python JSON parse.

The flatten mapInPandas inherits the documents scan's single row-group
partitioning, so the per-doc JSON parse runs as ONE task (~0.8 s of the
query, plans/r13/probe_hierarchical_stages.json). Arms, same session:

  base    — trees as-is (single-task parse)          [committed behavior]
  spreadN — trees.repartition(N) before hierarchical_summarize

The trade: parse parallelism vs 32-task scheduling on the ~6 small driver
jobs that follow (the blanket scan-spread probe measured that cost at
+1.47 s for this query; this probe isolates the flatten-only variant).

    python examples/probe_hier_flatten_spread.py [--rounds 4]
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


def build(spark, sf_dir: str, parts: int):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    trees = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _two_part_tree_json().alias("tree_json"),
    )
    if parts:
        trees = trees.repartition(parts)
    return hierarchical_summarize(
        trees, MockSummarizer(24), max_depth=1, chunk_size=60,
        chunk_overlap=10, token_max=80,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--parts", type=int, nargs="*", default=[0, 8, 32])
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vlds-probe-hier-flatten")

    arms = {(f"p{p}" if p else "base"): p for p in args.parts}
    for p in arms.values():  # warmup every arm
        build(spark, sf_dir, p).write.format("noop").mode("overwrite").save()

    reps = {k: [] for k in arms}
    for _ in range(args.rounds):
        for label, p in arms.items():
            spark.catalog.clearCache()
            gc.collect()
            release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
            t0 = time.perf_counter()
            build(spark, sf_dir, p).write.format("noop").mode("overwrite").save()
            reps[label].append(round(time.perf_counter() - t0, 3))

    out = {k: {"reps": v, "min": min(v)} for k, v in reps.items()}
    for k, row in out.items():
        print(f"# {k}: min={row['min']}s reps={row['reps']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
