"""Metric-engine entry point (SURVEY §3 EP3): the whole CLI as one DataFrame
job — ``gen JOIN ref ON doc_id`` -> metric columns -> moments/histogram.

Replaces the reference's subprocess + stdout-scraping design
(run_full_evaluation_pipeline.py:640-784) with in-process DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import clean_thinking_tokens
from ..operators.pairing import pair_docs_with_refs
from .aggregate import metric_moments, similarity_histogram
from .rouge import rouge_scores_udf


def evaluate_summaries(
    generated: DataFrame,
    references: DataFrame,
    gen_col: str = "summary",
    ref_col: str = "reference",
    id_col: str = "doc_id",
    max_samples: int | None = None,
    clean: bool = True,
) -> DataFrame:
    """Per-pair metric rows (M5 evaluate_pair composite).

    inner join on doc_id (J2) -> optional sort+limit (F4/O2) -> clean (F5) ->
    ROUGE struct (M1). Returns one row per evaluated pair: EVERY column of
    ``generated`` (so run metadata like (approach, model) survives into the
    metric rows — the reference reports summary statistics per run, and a
    multi-run table has several rows per doc_id that would otherwise be
    indistinguishable) plus rouge1_f / rouge2_f / rougeL_f.
    """
    pass_cols = list(generated.columns)
    paired = pair_docs_with_refs(
        generated,
        references.select(id_col, F.col(ref_col).alias("_ref")),
        key=id_col,
    )
    if max_samples is not None:
        # total order over every generated column: deterministic sampling
        # even when doc_id alone has ties (multiple runs per doc)
        paired = paired.orderBy(*pass_cols).limit(max_samples)
    gen = clean_thinking_tokens(gen_col) if clean else F.col(gen_col)
    scored = paired.withColumn("_scores", rouge_scores_udf(gen, F.col("_ref")))
    return scored.select(
        *pass_cols,
        F.col("_scores.rouge1_f").alias("rouge1_f"),
        F.col("_scores.rouge2_f").alias("rouge2_f"),
        F.col("_scores.rougeL_f").alias("rougeL_f"),
    )


def summary_statistics(metrics: DataFrame, group_cols: list[str] = []) -> DataFrame:
    """Aggregate stage (A2 + A4): moments per metric + rouge1 histogram."""
    moments = metric_moments(
        metrics, ["rouge1_f", "rouge2_f", "rougeL_f"], group_cols
    )
    hist = similarity_histogram(metrics, "rouge1_f", group_cols)
    if group_cols:
        return moments.join(hist, group_cols)
    return moments.crossJoin(hist)
