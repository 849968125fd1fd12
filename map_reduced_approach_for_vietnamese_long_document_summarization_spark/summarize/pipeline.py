"""Full evaluation pipeline orchestrator (SURVEY §3 EP1:
``run_full_evaluation_pipeline.py``).

The reference drives approach x model sweeps with a per-document Python loop,
subprocess metric evaluation, and stdout scraping (PIPE:640-784). Here the
sweep is a loop over *jobs*, not documents: each (approach, model) cell is
one corpus-wide DataFrame pipeline; metrics are in-process DataFrames; the
manifest is the only driver-side object (scalars, not data).

Incremental recompute (F3, PIPE:423-431): when a sink directory already holds
summaries for a cell, those doc_ids are anti-joined away before the expensive
summarize stage, and prior results are unioned back in.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..metrics.aggregate import best_by_metric
from ..metrics.evaluate import evaluate_summaries, summary_statistics
from ..operators.pairing import skip_existing
from .approaches import (
    iterative_refine_summarize,
    mapreduce_summarize,
    truncated_summarize,
)
from .critique import MockCritic, mapreduce_critique_summarize
from .summarizer import Summarizer

APPROACHES: dict[str, Callable] = {
    "truncated": lambda docs, s, cfg: truncated_summarize(
        docs, s, max_input_tokens=cfg.get("max_input_tokens", 16384)
    ),
    "mapreduce": lambda docs, s, cfg: mapreduce_summarize(
        docs,
        s,
        chunk_size=cfg.get("chunk_size", 1200),
        chunk_overlap=cfg.get("chunk_overlap", 50),
        token_max=cfg.get("token_max", 1000),
    ),
    "iterative": lambda docs, s, cfg: iterative_refine_summarize(
        docs, s, chunk_size=cfg.get("chunk_size", 800), chunk_overlap=cfg.get("chunk_overlap", 50)
    ),
    "mapreduce_critique": lambda docs, s, cfg: mapreduce_critique_summarize(
        docs,
        s,
        cfg.get("critic") or MockCritic(),
        chunk_size=cfg.get("chunk_size", 12000),
        chunk_overlap=cfg.get("chunk_overlap", 200),
        token_max=cfg.get("token_max", 10000),
        max_critique_iterations=cfg.get("max_critique_iterations", 2),
    ),
}


@dataclass
class SweepResult:
    summaries: DataFrame  # (doc_id, approach, model, summary)
    metrics: DataFrame  # per-pair metric rows tagged (approach, model)
    statistics: DataFrame  # moments + histogram per (approach, model)
    best_models: DataFrame  # winner per (approach, metric)
    manifest: dict = field(default_factory=dict)


def run_evaluation_pipeline(
    docs: DataFrame,
    references: DataFrame,
    summarizers: dict[str, Summarizer],
    approaches: list[str] | None = None,
    config: dict | None = None,
    out_dir: str | None = None,
    max_samples: int | None = None,
) -> SweepResult:
    """approach x model sweep -> summaries, metrics, statistics, best-model
    comparison, and a run manifest (S6).

    ``out_dir`` enables both the parquet summary sink and incremental skip:
    existing (approach, model) partitions contribute their rows (restricted
    to the docs in THIS run's scope, so ``max_samples`` reruns over a
    populated out_dir stay sample-sized) and are not regenerated. Paths go
    through the Hadoop FileSystem API, so ``hdfs://``/``s3a://`` out_dirs
    work like local ones (driver-local ``os.path`` checks would silently
    disable the skip — duplicate summaries appended on every rerun — and
    write the manifest to a bogus local path).

    Without ``out_dir``, each cell's summaries are persist()ed so the
    metric stage reuses them instead of re-calling the summarizer; the
    caches ride on ``result.summaries._persisted_inputs`` — release them
    via ``operators.dedup.unpersist_inputs(result.summaries)`` AFTER
    materializing everything you need (statistics/best are lazy plans over
    those caches)."""
    approaches = approaches or list(APPROACHES)
    if not approaches:
        raise ValueError("no approaches given")
    if not summarizers:
        raise ValueError("no summarizers given")
    unknown = [a for a in approaches if a not in APPROACHES]
    if unknown:
        raise ValueError(f"unknown approaches: {unknown}")
    config = config or {}
    t_start = time.time()
    per_cell: list[DataFrame] = []
    persisted: list[DataFrame] = []
    cell_stats: dict[str, dict] = {}
    spark = docs.sparkSession

    def _hdir_exists(path: str) -> bool:
        # scheme-agnostic (file:/hdfs:/s3a:) — os.path.isdir is driver-local
        # and always False for object-store URIs
        p = spark._jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)

    if max_samples is not None:
        docs = docs.orderBy("doc_id").limit(max_samples)

    for approach in approaches:
        build = APPROACHES[approach]
        for model, summarizer in summarizers.items():
            cell_dir = (
                f"{out_dir.rstrip('/')}/approach={approach}/model={model}"
                if out_dir
                else None
            )
            todo = docs
            cell_exists = bool(cell_dir) and _hdir_exists(cell_dir)
            if cell_exists:
                existing = spark.read.parquet(cell_dir)
                todo = skip_existing(docs, existing, "doc_id")
            n_new = todo.count() if cell_dir else None
            t0 = time.time()
            fresh = build(todo, summarizer, config.get(approach, {}))
            if cell_dir:
                if cell_exists:
                    # the incremental plan lazily READS cell_dir (skip_existing
                    # anti-join); materialize before append-writing the same
                    # directory, or a task retry / mid-write re-listing could
                    # double-read or treat a partial cell as complete
                    fresh = fresh.localCheckpoint(eager=True)
                fresh.write.mode("append").parquet(cell_dir)
                # restrict the read-back to THIS run's doc scope: the cell
                # dir may hold a larger prior corpus (full sweep before a
                # max_samples rerun), which would otherwise flow into the
                # metrics and silently ignore the requested sample
                fresh = spark.read.parquet(cell_dir).join(
                    docs.select("doc_id"), "doc_id", "left_semi"
                )
            else:
                # force execution inside the timed region (plans are lazy);
                # the cache is reused by the metric stage below — released
                # by the caller via the _persisted_inputs hook (docstring)
                fresh = fresh.persist()
                fresh.count()
                persisted.append(fresh)
            cell = fresh.select(
                "doc_id",
                F.lit(approach).alias("approach"),
                F.lit(model).alias("model"),
                "summary",
            )
            per_cell.append(cell)
            cell_stats[f"{approach}/{model}"] = {
                "seconds": round(time.time() - t0, 3),
                **({"new_docs": n_new} if n_new is not None else {}),
            }

    all_summaries = per_cell[0]
    for c in per_cell[1:]:
        all_summaries = all_summaries.unionByName(c)

    # per-pair metrics, tagged by cell (one evaluate per cell keeps the UDF
    # batched per join; union the tagged results)
    tagged = []
    for approach in approaches:
        for model in summarizers:
            cell = all_summaries.filter(
                (F.col("approach") == approach) & (F.col("model") == model)
            )
            m = evaluate_summaries(cell, references, max_samples=None).select(
                "doc_id",
                F.lit(approach).alias("approach"),
                F.lit(model).alias("model"),
                "rouge1_f",
                "rouge2_f",
                "rougeL_f",
            )
            tagged.append(m)
    metrics = tagged[0]
    for m in tagged[1:]:
        metrics = metrics.unionByName(m)

    statistics = summary_statistics(metrics, ["approach", "model"])
    best = best_by_metric(
        statistics.select("approach", "model", F.col("rouge1_f_mean").alias("score")),
        "score",
        "model",
        ["approach"],
    ).select("approach", F.col("model").alias("best_model"), F.round("score", 6).alias("score"))

    manifest = {
        "approaches": approaches,
        "models": list(summarizers),
        "config": {k: v for k, v in config.items() if not callable(v)},
        "cells": cell_stats,
        "total_seconds": round(time.time() - t_start, 3),
    }
    if out_dir:
        # Hadoop FS write: the manifest lands NEXT TO the data on whatever
        # filesystem out_dir names (a driver-local open() would create a
        # bogus './s3a:/...' path for object-store sinks)
        jvm = spark._jvm
        mpath = jvm.org.apache.hadoop.fs.Path(f"{out_dir.rstrip('/')}/manifest.json")
        fs = mpath.getFileSystem(spark._jsc.hadoopConfiguration())
        stream = fs.create(mpath, True)
        try:
            stream.write(
                bytearray(json.dumps(manifest, indent=2, default=str).encode("utf-8"))
            )
        finally:
            stream.close()

    res = SweepResult(all_summaries, metrics, statistics, best, manifest)
    all_summaries._persisted_inputs = persisted  # caller-controlled release
    return res
