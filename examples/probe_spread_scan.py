"""A/B probe: does redistributing under-parallelized scans (guide §2.5
"input skew: one huge unsplittable file ... repartition immediately after
the read") speed up the heavy map-stage queries at sf0.1?

The sf testdata tables are single-row-group parquet files, so every scan is
ONE effective task and all scan-rooted map work (md5 MinHash families,
SimHash bit votes, winnowing gram hashing, SRP signatures, chunking/mock
summarizer pandas UDFs) serializes onto one of the 32 local cores — the
exact caveat `char_entropy_batch`'s docstring records. At 100 TB a corpus
scans as thousands of splits, so a conditional repartition (only when scan
partitions < defaultParallelism) is a no-op there and a pure
parallelism-restoring fix here.

    python examples/probe_spread_scan.py [--names a,b,...] [--reps 3]

Prints per-query base vs spread best-of-reps seconds + ratio.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = [
    "minhash_md5_star_dedup",
    "minhash_md5_incremental_dedup",
    "minhash_star_fast",
    "minhash_lsh_dedup",
    "doc_winnow_fingerprints",
    "doc_winnow_fast",
    "ann_recall_at3",
    "doc_quality_report",
    "doc_dup_clusters",
    "ngram_jaccard_top20",
    "doc_contamination_top20",
    "simhash_near_dups",
    "doc_repetition_stats",
    "embedding_ann_lsh_top3",
    "embedding_split_contamination",
    "pipeline_mapreduce_mock",
    "pipeline_hierarchical_mock",
    "rouge1_per_doc",
    "bpe_token_counts",
    "doc_char_entropy",
    "pricing_summary",
    "doc_stats_by_lang",
    "doc_text_normalize",
    "events_resample_1h_ffill",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n] or DEFAULT_NAMES

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        persistent_rdd_ids,
        release_rdds,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
        QUERIES,
    )
    spark = get_spark(app_name="vlds-probe-spread")

    # A/B through the REAL mechanism (sources/tables.spread_scan), toggled by
    # its env knob: base = spreading disabled everywhere, spread = the
    # committed per-call-site opt-ins (plans/*.py `spread=True` sites).
    def set_t(mode):
        if mode == "base":
            os.environ["SPARK_GRAFT_SPREAD_MIN_BYTES"] = "0"
        else:
            os.environ.pop("SPARK_GRAFT_SPREAD_MIN_BYTES", None)

    def run_once(name: str) -> float:
        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        start = time.perf_counter()
        QUERIES[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - start, 3)

    # warmup
    QUERIES["pricing_summary"](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        row = {}
        for mode in ("base", "spread"):
            set_t(mode)
            spark.sparkContext.setJobDescription(f"probe {name} [{mode}]")
            times = [run_once(name) for _ in range(args.reps)]
            row[mode] = min(times)
            row[f"{mode}_reps"] = times
        set_t("base")
        row["ratio"] = round(row["spread"] / row["base"], 3) if row["base"] else None
        results[name] = row
        print(f"# {name}: base={row['base']}s spread={row['spread']}s "
              f"ratio={row['ratio']}", file=sys.stderr)

    set_t("spread")
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
