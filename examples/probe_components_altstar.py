"""Round-13 head-to-head: alternating large-star/small-star vs the default
flooding connected-components (VERDICT r12 item 6; SCALE.md records the
verdict).

Two workloads, interleaved within one session so box drift hits all arms
equally (the round-4 star-contraction probe protocol):

* REAL — the full doc_dup_clusters pair graph at sf0.1 (SimHash md5-32,
  hamming <= 6): dense near-dup components, tiny diameter. Timed from the
  SAME persisted pair table so only the component stage differs.
* CHAIN — a 50k-node path, the adversarial diameter case the Kiveris
  variant is built for.

Arms: flooding contract=True (default), flooding contract=False,
altstar. Reports per-arm min/median wall-clock and convergence rounds.

    python examples/probe_components_altstar.py [--reps 3] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--chain-n", type=int, default=50_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
        connected_components,
        connected_components_altstar,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        md5_hash32,
        simhash_near_dup_pairs,
    )

    spark = get_spark(app_name="vlds-probe-altstar")
    sc = spark.sparkContext

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    pairs = simhash_near_dup_pairs(
        docs, max_hamming=6, bits=32, hash_col_fn=md5_hash32
    ).persist()
    n_pairs = pairs.count()  # materialize once: arms time ONLY the components
    node_ids = docs.select("doc_id").persist()
    n_docs = node_ids.count()
    print(f"# real graph: {n_pairs} pairs over {n_docs} docs", file=sys.stderr)

    chain = spark.range(args.chain_n - 1).select(
        F.col("id").alias("id1"), (F.col("id") + 1).alias("id2")
    ).persist()
    chain.count()

    def run(arm: str, workload: str):
        stats: dict = {}
        if workload == "real":
            e, nodes = pairs, node_ids
        else:
            e, nodes = chain, None
        t0 = time.perf_counter()
        if arm == "altstar":
            out = connected_components_altstar(e, nodes=nodes, stats=stats)
        else:
            out = connected_components(e, nodes=nodes, contract=(arm == "flood"))
        n_comp = out.select("component").distinct().count()
        dt = time.perf_counter() - t0
        return round(dt, 3), stats.get("rounds"), n_comp

    arms = ["flood", "flood-nocontract", "altstar"]
    results: dict = {w: {a: {"times": [], "rounds": None, "n_comp": None}
                         for a in arms} for w in ("real", "chain")}
    for rep in range(args.reps):
        for workload in ("real", "chain"):
            for arm in arms:
                spark.catalog.clearCache()
                pairs.persist().count()
                node_ids.persist().count()
                chain.persist().count()
                dt, rounds, n_comp = run(arm, workload)
                r = results[workload][arm]
                r["times"].append(dt)
                r["rounds"] = rounds if rounds is not None else r["rounds"]
                if r["n_comp"] is None:
                    r["n_comp"] = n_comp
                elif r["n_comp"] != n_comp:
                    raise SystemExit(
                        f"NON-DETERMINISTIC component count: {workload}/{arm}")
                print(f"# rep{rep} {workload:5s} {arm:16s} {dt:7.3f}s "
                      f"rounds={rounds} n_comp={n_comp}", file=sys.stderr)

    # arms must agree on the component count per workload
    for workload, by_arm in results.items():
        counts = {a: r["n_comp"] for a, r in by_arm.items()}
        if len(set(counts.values())) != 1:
            raise SystemExit(f"ARMS DISAGREE on {workload}: {counts}")

    summary = {
        w: {
            a: {
                "min": min(r["times"]),
                "median": round(statistics.median(r["times"]), 3),
                "reps": r["times"],
                "rounds": r["rounds"],
                "n_comp": r["n_comp"],
            }
            for a, r in by_arm.items()
        }
        for w, by_arm in results.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
