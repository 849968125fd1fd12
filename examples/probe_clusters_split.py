"""A/B probe: split-load variant of doc_dup_clusters (round 13, §2.5).

The committed query loads documents ONCE and feeds the same DataFrame to
both the SimHash pairs stage (heavy per-row map work — wants the spread
scan) and the components loop's ``nodes`` side (doc_id only, re-read by
per-round driver actions — the spread exchange is pure overhead there,
measured +0.84 s under the blanket spread default). This probe measures the
surgical middle: spread the pairs input, keep the nodes load unspread.

    python examples/probe_clusters_split.py [--reps 4] [--out FILE]

Modes: "committed" (the registry query as-is) vs "split" (inline variant).
Both run via the noop sink; interleaved rep pairs so box drift hits both
arms equally.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        persistent_rdd_ids,
        release_rdds,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
        connected_components,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        md5_hash32,
        simhash_near_dup_pairs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import load_table

    spark = get_spark(app_name="vlds-probe-clusters-split")
    sf_dir = args.sf_dir

    def split_variant():
        docs_s = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
        docs_u = load_table(spark, sf_dir, "documents").select("doc_id")
        pairs = simhash_near_dup_pairs(docs_s, max_hamming=6, bits=32, hash_col_fn=md5_hash32)
        comp = connected_components(pairs, nodes=docs_u, id_col="doc_id")
        sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
        return comp.join(sizes, "component").select(
            "doc_id", F.col("component").alias("cluster_id"), "cluster_size"
        )

    builders = {
        "committed": lambda: QUERIES["doc_dup_clusters"](spark, sf_dir),
        "split": split_variant,
    }

    def run_once(build) -> float:
        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        start = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - start, 3)

    # warmup both arms once (codegen/JIT), then interleave timed reps
    for b in builders.values():
        run_once(b)
    results = {k: {"reps": []} for k in builders}
    for _ in range(args.reps):
        for k, b in builders.items():
            spark.sparkContext.setJobDescription(f"clusters-split probe [{k}]")
            results[k]["reps"].append(run_once(b))
    for k in results:
        results[k]["best"] = min(results[k]["reps"])
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
