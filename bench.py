"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with the
noop sink (full materialization, no driver collect cost) and timed
$SPARK_GRAFT_BENCH_REPS times (default 3, best-of — single-run numbers on a
shared box swing ~2x on JIT/GC noise; min is the standard noise floor).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids as _persistent_rdd_ids,
    release_rdds as _release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES

HEADLINE = [
    "pricing_summary",
    "shipping_priority_q3",
    "local_supplier_volume_q5",
    "returned_item_customers_q10",
    "top_revenue_orders",
    "late_shipment_counts",
    "top2_orders_per_customer",
    "customer_running_spend",
    "events_sessionization",
    "events_tumbling_10min",
    "events_resample_1h_ffill",
    "events_trailing_24h_stats",
    "doc_stats_by_lang",
    "doc_chunk_fixed100",
    "doc_exact_dedup",
    "doc_span_dedup",
    "ngram_jaccard_top20",
    "minhash_lsh_dedup",
    "rouge1_per_doc",
    "embedding_knn_top3",
    "embedding_ann_lsh_top3",
    "simhash_near_dups",
    "events_sliding_10m_5m",
    "pipeline_truncated_mock",
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "bertscore_mock_pairs",
    "bpe_token_counts",
    "doc_winnow_fingerprints",
    "doc_winnow_fast",
    "ann_recall_at3",
    "multimodal_decode_features",
    "doc_dup_clusters",
    "doc_contamination_top20",
    "corpus_pack_512",
    "corpus_pack_greedy_512",
    "doc_split_assign",
    "doc_repetition_stats",
    "doc_pii_redact",
    "order_priority_exists_late",
    "bm25_search_top10",
    "purchase_click_attribution",
    "corpus_top_bigrams",
    "doc_epoch_upsample",
    "doc_char_entropy",
    "doc_tfidf_top3",
    "doc_unigram_logprob",
    "doc_feature_hash_embed",
    "doc_quality_report",
    "doc_source_quota",
    "embedding_split_contamination",
    "embedding_semantic_dedup",
    # TPC-H silhouette representatives (heaviest join shapes of the family)
    "q9_product_profit",
    "q13_customer_distribution",
    "q21_latest_shipper",
    # round-4 additions
    "doc_line_dedup",
    "doc_bloom_skip_existing",
    "minhash_md5_star_dedup",
    "minhash_md5_incremental_dedup",
    "hybrid_search_top10",
    "events_click_in_purchase_window",
    "doc_text_normalize",
    "doc_length_iqr_outliers",
    "media_ahash_near_dups",
    "doc_compression_ratio",
    # round-5 additions: xxhash64 production twins of the two 5s md5 oracle
    # twins above — the bench shows production cost next to the md5
    # replayability tax (same convention as winnow fingerprints/fast)
    "minhash_star_fast",
    "minhash_incremental_fast",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark(app_name="vlds-bench")

    # warmup: trigger JVM/codegen/parquet-footer caches so the first timed
    # query doesn't absorb session startup cost
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-3 by default: this box shows heavy cross-tenant noise (the same
    # plan has measured 3s and 52s minutes apart), and best-of-2 still lets a
    # noisy pair poison a query's number
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(reps):
            # drop persisted intermediates: Spark's cache manager matches by
            # canonicalized plan, so a repeat run would silently reuse the
            # previous rep's persist() tables and under-report real cost.
            # Also release localCheckpoint RDDs (clearCache does NOT touch
            # them; accumulated checkpoints from the components/collapse
            # loops degrade later queries via executor-memory pressure —
            # measured 12s -> 131s on repeated doc_dup_clusters runs).
            # Safe here: no DataFrame from a previous rep is ever reused.
            spark.catalog.clearCache()
            gc.collect()
            _release_rdds(spark.sparkContext, _persistent_rdd_ids(spark.sparkContext))
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    # full-precision record next to the script (the per-round harness keeps
    # only the LAST ~2000 chars of stdout, and 69 queries no longer fit at
    # 3 decimals — round 4's recorded JSON lost its head to exactly this)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_last.json"), "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout line below is still the contract
    # stdout contract: ONE parseable JSON line. Adaptively drop per-query
    # decimals until the line fits the 2000-char tail window with slack.
    # 1995 = the observed 2000-char window minus the trailing newline with
    # a little slack; break and fallback MUST share the constant or a line
    # landing between the two thresholds gets neither treatment
    target = 1995
    for nd in (3, 2, 1):
        slim = dict(result, queries={k: round(v, nd) for k, v in timings.items()},
                    value=round(total, nd))
        line = json.dumps(slim, separators=(",", ":"))
        if len(line) <= target:
            break
    if len(line) > target:
        # last resort as the registry keeps growing: keep the most
        # expensive queries (the ones perf review reads first), count the
        # rest; bench_last.json always has the full map
        q = sorted(timings.items(), key=lambda kv: -kv[1])
        while len(line) > target and q:
            q = q[:-1]
            slim = dict(
                result,
                queries={k: round(v, 1) for k, v in q},
                value=round(total, 1),
                omitted=len(timings) - len(q),
            )
            line = json.dumps(slim, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
