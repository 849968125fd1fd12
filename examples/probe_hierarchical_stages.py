"""Stage decomposition of pipeline_hierarchical_mock (round-13 close probe).

The query is a driver loop, so explain() of the returned DataFrame only shows
the FINAL stage — the eager per-level jobs (flatten checkpoint, max-depth
probe, isEmpty, the mapreduce round-0 convergence count, the level
checkpoint) are invisible to the plan file. This probe re-runs the pipeline
with a wall-clock timer around each driver-side job boundary so round 2
inherits measured facts about WHERE the ~3s goes instead of guesses.

    python examples/probe_hierarchical_stages.py [--reps 3]

Prints per-stage seconds per rep plus the per-stage min, and the end-to-end
registered-query time for the same session as the control.
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
    RollingCheckpoint,
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans.relational import (
    _t,
    _two_part_tree_json,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.approaches import (
    mapreduce_summarize,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.hierarchical import (
    _collapse_level,
    _max_depth,
    flatten_tree_json,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.text import (
    clean_thinking_tokens,
)


def run_decomposed(spark, sf_dir: str) -> dict[str, float]:
    """pipeline_hierarchical_mock's exact computation, stage-timed. Mirrors
    hierarchical_summarize(max_depth=1, chunk_size=60, chunk_overlap=10,
    token_max=80) + the registered query's tree lift, keeping every job in
    the same order so the stage sum tracks the end-to-end time."""
    t: dict[str, float] = {}
    summarizer = MockSummarizer(24)
    sc = spark.sparkContext

    t0 = time.perf_counter()
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    trees = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _two_part_tree_json().alias("tree_json"),
    )
    rc = RollingCheckpoint(sc)
    nodes = rc.checkpoint(flatten_tree_json(trees, "tree_json", "doc_id"))
    t["1_flatten_ckpt"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    actual = _max_depth(nodes)
    t["2_max_depth"] = time.perf_counter() - t0

    for depth in range(min(1, actual), 0, -1):
        t0 = time.perf_counter()
        before = persistent_rdd_ids(sc)
        out = _collapse_level(nodes, depth, summarizer, 60, 10, 80)
        t["3_collapse_level_build"] = time.perf_counter() - t0
        # _collapse_level runs targets.isEmpty() and the inner mapreduce's
        # convergence count EAGERLY while "building"; the level checkpoint
        # below is the remaining materialization
        if out is nodes:
            continue
        t0 = time.perf_counter()
        nodes = rc.checkpoint(out)
        release_rdds(sc, (persistent_rdd_ids(sc) - before) - rc.live_ids)
        t["4_level_ckpt"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    final_in = (
        nodes.filter(F.col("node_type") == "Paragraph")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("node_id").alias("o"), F.col("text").alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
                "\n\n",
            ).alias("doc_text")
        )
    )
    final = mapreduce_summarize(
        final_in, summarizer, chunk_size=60, chunk_overlap=10, token_max=80,
        id_col="doc_id", text_col="doc_text",
    )
    t["5_final_mapreduce_build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    final = summarizer.summarize_df(final, "summary", "summary")
    all_ids = trees.select(F.col("doc_id").cast("string").alias("doc_id")).distinct()
    result = all_ids.join(final, "doc_id", "left").select(
        "doc_id",
        F.coalesce(clean_thinking_tokens("summary"), F.lit("")).alias("summary"),
    )
    result.write.format("noop").mode("overwrite").save()
    t["6_polish_join_write"] = time.perf_counter() - t0
    return {k: round(v, 3) for k, v in t.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vlds-probe-hier")

    # warmup both paths
    QUERIES["pipeline_hierarchical_mock"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    run_decomposed(spark, sf_dir)

    stage_reps: list[dict[str, float]] = []
    e2e: list[float] = []
    for _ in range(args.reps):
        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        stage_reps.append(run_decomposed(spark, sf_dir))

        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        t0 = time.perf_counter()
        QUERIES["pipeline_hierarchical_mock"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        e2e.append(round(time.perf_counter() - t0, 3))

    keys = sorted({k for r in stage_reps for k in r})
    mins = {k: min(r.get(k, float("nan")) for r in stage_reps) for k in keys}
    out = {
        "stage_min": mins,
        "stage_min_total": round(sum(mins.values()), 3),
        "e2e_registered": {"reps": e2e, "min": min(e2e)},
        "stage_reps": stage_reps,
    }
    for k in keys:
        print(f"# {k}: min={mins[k]}s reps={[r.get(k) for r in stage_reps]}",
              file=sys.stderr)
    print(f"# e2e registered query: min={min(e2e)}s reps={e2e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
