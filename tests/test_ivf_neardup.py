import numpy as np
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_build_index,
    ivf_topk,
)


def _clustered(spark, n_centers=4, per=25, dim=16, noise=0.05, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, dim))
    rows = []
    for i in range(n_centers * per):
        v = centers[i % n_centers] + noise * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ivf_index_and_search(spark):
    corpus = _clustered(spark)
    assigned, centroids = ivf_build_index(corpus, n_lists=4)
    assert len(centroids) == 4 and len(centroids[0]) == 16
    # every vector assigned to exactly one cell
    assert assigned.count() == 100
    assert assigned.select("cell").distinct().count() <= 4

    queries = corpus.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(queries, corpus, k=1).filter("rnk = 1").collect()
    }
    ivf = {
        r.query_id: r.neighbor_id
        for r in ivf_topk(queries, assigned, centroids, k=1, n_probe=1)
        .filter("rnk = 1")
        .collect()
    }
    # clustered data: nearest neighbor lives in the query's own cell
    hits = sum(1 for q, n in exact.items() if ivf.get(q) == n)
    assert hits >= 3, f"{ivf} vs {exact}"


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base + 0.01 * rng.standard_normal(16)]),  # near-dup
        (2, [float(x) for x in rng.standard_normal(16)]),  # unrelated
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(df, dim=16, threshold=0.95).collect()
    assert [(p.id1, p.id2) for p in pairs] == [(0, 1)]
    assert pairs[0].cosine > 0.99
