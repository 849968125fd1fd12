"""Learned quality classifier over hashed bag-of-words features — the
fastText/DCLM-style quality gate that replaced pure heuristics in modern
web-corpus curation (train a linear model on a small labeled seed set,
score the whole corpus, keep the top fraction).

Architecture mirrors the IVF family's train-small / score-everywhere
split:

* ``train_quality_classifier`` fits a seeded ``pyspark.ml``
  LogisticRegression on a LABELED sample (thousands of rows — the fit
  never touches the corpus) and returns plain Python ``(coefficients,
  intercept)``;
* ``score_quality`` applies the model to the corpus's SPARSE hashed
  features as pure DataFrame ops — broadcast the (dims-row) coefficient
  table, join on the hash bucket, one grouped sum, a sigmoid. The trained
  model becomes literals/broadcast rows, so scoring runs at scan speed
  with one narrow shuffle and is SQL-replayable when the coefficients are
  known (the harness's seeded-coefficient twin query replays it in
  DuckDB, the same verification pattern as ``ivf_fixed_centroids``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_quality_classifier(
    labeled: DataFrame,
    dims: int = 64,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> tuple[list[float], float]:
    """Fit a logistic-regression quality model on labeled documents
    (label 1 = keep, 0 = drop) over ``dims``-bucket hashed features.
    Returns ``(coefficients, intercept)`` as plain Python floats — a few
    hundred bytes that broadcast anywhere; persist them next to the corpus
    manifest and re-score without refitting."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from .features import feature_hash_embed, to_dense_vector

    sparse = feature_hash_embed(
        labeled.select(id_col, text_col), dims=dims, id_col=id_col, text_col=text_col
    )
    dense = to_dense_vector(sparse, dims=dims, id_col=id_col)
    # LEFT join from the labels with a zero-vector fallback: token-less
    # labeled docs (empty/boilerplate-stripped — often the "drop" class)
    # have no feature rows, and an inner join would silently train on a
    # shifted class balance while score_quality still scores exactly those
    # docs with the resulting intercept
    zeros = F.array(*[F.lit(0.0)] * dims)
    train = (
        labeled.select(id_col, label_col)
        .join(dense, id_col, "left")
        .select(
            F.col(label_col).cast("double").alias("label"),
            array_to_vector(F.coalesce(F.col("embedding"), zeros)).alias("features"),
        )
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param, standardization=False)
    model = lr.fit(train)
    return [float(c) for c in model.coefficients], float(model.intercept)


def score_quality(
    docs: DataFrame,
    coefficients: list[float],
    intercept: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Score every document with a linear quality model:
    ``(id, quality_prob)`` where quality_prob = sigmoid(w . features + b)
    over the L2-normalized hashed bag-of-words. Token-less docs (no
    feature rows) score ``sigmoid(intercept)`` — the model's prior.

    Scale: the corpus explodes once into (id, dim, weight) sparse rows
    (shared ``term_postings`` when provided), the coefficient table is
    ``dims`` broadcast rows, and the score is one map-side-combinable
    grouped sum — no dense vectors ever materialize corpus-wide."""
    from .features import feature_hash_embed

    dims = len(coefficients)
    spark = docs.sparkSession
    coef = spark.createDataFrame(
        [(i, float(c)) for i, c in enumerate(coefficients)], "dim int, coef double"
    )
    sparse = feature_hash_embed(
        docs.select(id_col, text_col), dims=dims, id_col=id_col,
        text_col=text_col, postings=postings,
    )
    dots = (
        sparse.join(F.broadcast(coef), "dim")
        .groupBy(id_col)
        .agg(F.sum(F.col("weight") * F.col("coef")).alias("_dot"))
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("_dot"), F.lit(0.0)) + F.lit(float(intercept)))))
    return (
        docs.select(id_col)
        .join(dots, id_col, "left")
        .select(id_col, prob.alias("quality_prob"))
    )


def fixed_quality_coefficients(dims: int = 64, seed: int = 11) -> tuple[list[float], float]:
    """Seeded pseudo-random coefficients — the oracle-checkable twin of
    ``train_quality_classifier``'s learned weights (the SCORING path —
    bucketing, dot, sigmoid — is identical and fully SQL-replayable with
    the coefficients as literals; the same verification pattern as
    ``ivf_fixed_centroids``)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dims).round(6)], 0.1
