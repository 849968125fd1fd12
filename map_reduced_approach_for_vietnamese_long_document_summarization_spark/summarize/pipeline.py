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
    existing (approach, model) partitions contribute their rows and are not
    regenerated."""
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
    cell_stats: dict[str, dict] = {}

    if max_samples is not None:
        docs = docs.orderBy("doc_id").limit(max_samples)

    for approach in approaches:
        build = APPROACHES[approach]
        for model, summarizer in summarizers.items():
            cell_dir = (
                os.path.join(out_dir, f"approach={approach}", f"model={model}")
                if out_dir
                else None
            )
            todo = docs
            if cell_dir and os.path.isdir(cell_dir):
                spark = docs.sparkSession
                existing = spark.read.parquet(cell_dir)
                todo = skip_existing(docs, existing, "doc_id")
            n_new = todo.count() if cell_dir else None
            t0 = time.time()
            fresh = build(todo, summarizer, config.get(approach, {}))
            if cell_dir:
                if os.path.isdir(cell_dir):
                    # the incremental plan lazily READS cell_dir (skip_existing
                    # anti-join); materialize before append-writing the same
                    # directory, or a task retry / mid-write re-listing could
                    # double-read or treat a partial cell as complete
                    fresh = fresh.localCheckpoint(eager=True)
                fresh.write.mode("append").parquet(cell_dir)
                fresh = docs.sparkSession.read.parquet(cell_dir)
            else:
                # force execution inside the timed region (plans are lazy);
                # the cache is reused by the metric stage below
                fresh = fresh.persist()
                fresh.count()
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
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, default=str)

    return SweepResult(all_summaries, metrics, statistics, best, manifest)
