"""Statistical aggregation over per-pair metric rows (SURVEY §2.5 A2/A4/A5).

Mirrors the reference's summary-statistics stage (evaluate/evaluate_summaries
_semantic.py:600-671) and best-model comparison (run_full_evaluation_pipeline
.py:909-921): moments use **population** std (numpy default) -> stddev_pop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def metric_moments(
    df: DataFrame, metric_cols: list[str], group_cols: list[str] = []
) -> DataFrame:
    """mean/std(pop)/min/max per metric column (A2), optionally per group."""
    aggs = []
    for m in metric_cols:
        aggs += [
            F.avg(m).alias(f"{m}_mean"),
            F.stddev_pop(m).alias(f"{m}_std"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    aggs.append(F.count(F.lit(1)).alias("n"))
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def similarity_histogram(
    df: DataFrame,
    score_col: str,
    group_cols: list[str] = [],
    hi: float = 0.7,
    lo: float = 0.4,
) -> DataFrame:
    """The >=0.7 / 0.4-0.7 / <0.4 bucket counting (A4, evaluate_summaries_
    semantic.py:661-671) as one conditional aggregation.

    Invariant note: NULL scores fall in NO bucket (conditional counts skip
    them), so ``n_high + n_mid + n_low`` can be LESS than
    ``metric_moments``' row count ``n`` when unscored pairs exist —
    consumers computing corpus percentages should divide by the bucket sum
    (or count NULLs separately), not by ``n``."""
    s = F.col(score_col)
    aggs = [
        F.count(F.when(s >= hi, 1)).alias("n_high"),
        F.count(F.when((s >= lo) & (s < hi), 1)).alias("n_mid"),
        F.count(F.when(s < lo, 1)).alias("n_low"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def best_by_metric(
    df: DataFrame, metric_col: str, candidate_col: str = "model", group_cols: list[str] = []
) -> DataFrame:
    """Arg-max comparison (A5): which candidate wins each metric. Rank window
    with an explicit candidate tiebreak — deterministic where max_by isn't.
    NaN/NULL scores are excluded before ranking: Spark sorts NaN ABOVE every
    real number, so a candidate whose metric degenerated to NaN would
    otherwise be silently crowned the winner."""
    c = F.col(metric_col)
    scored = df.filter(c.isNotNull() & ~F.isnan(c.cast("double")))
    w = Window.partitionBy(*group_cols).orderBy(F.desc(metric_col), candidate_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier flagging: adds ``q1``, ``q3`` and ``is_outlier``
    (value outside ``[q1 - k*iqr, q3 + k*iqr]``) — the robust trim for
    metric/quality distributions where a mean±stddev fence is dragged by
    the very outliers it should catch. ``by`` computes the fences per group
    (e.g. per language: a short-doc language's length fence differs from a
    long-doc one's).

    Scale: one exact ``percentile`` aggregate over the (small) group keys,
    broadcast back onto the rows — no window over the full frame, no sort
    of the corpus. Exact quantiles (linear interpolation, DuckDB
    ``quantile_cont`` parity) keep the oracle replayable; swap in
    ``percentile_approx`` at 100 TB if the value column is too wide for an
    exact percentile's per-group state."""
    clash = {"q1", "q3", "is_outlier", "_iqr_key"} & set(df.columns)
    if clash:
        raise ValueError(
            f"iqr_outliers reserves output columns {sorted(clash)}; rename "
            "them first (an existing q1/q3 would make the fence expressions "
            "ambiguous or silently wrong)"
        )
    keys = [by] if by else []
    fences = df.groupBy(*keys).agg(
        F.percentile(value_col, F.lit(0.25)).alias("q1"),
        F.percentile(value_col, F.lit(0.75)).alias("q3"),
    )
    if keys:
        # null-safe key: groupBy treats a NULL group as its own stratum, but
        # a plain equi-join would silently DROP every NULL-group row from
        # the output (neither flagged nor passed through)
        fences = fences.withColumnRenamed(by, "_iqr_key")
        joined = df.join(
            F.broadcast(fences), F.col(by).eqNullSafe(F.col("_iqr_key"))
        ).drop("_iqr_key")
    else:
        joined = df.crossJoin(F.broadcast(fences))
    iqr = F.col("q3") - F.col("q1")
    out = (F.col(value_col) < F.col("q1") - F.lit(k) * iqr) | (
        F.col(value_col) > F.col("q3") + F.lit(k) * iqr
    )
    return joined.withColumn("is_outlier", out)
