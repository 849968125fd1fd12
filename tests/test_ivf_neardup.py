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


def test_semantic_dedup_passes_null_embeddings_through(spark):
    """A NULL embedding cannot be compared: it must survive as-is (NULL
    cell), not crash the whole cell's np.stack or silently vanish."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
        semantic_dedup,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.001]),  # near-dup of 1 -> dominated
            (3, None),          # corrupt row
        ],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(corpus, [[1.0, 0.0]], threshold=0.99)
    rows = {r.vec_id: r for r in out.collect()}
    assert set(rows) == {1, 3}  # 2 dominated; 3 survives
    assert rows[3].cell is None


def test_cosine_null_vector_ranks_last_not_zero(spark):
    """A NULL/corrupt embedding yields NULL similarity (ranked last under
    desc), never a fabricated 0.0 that outranks negative-cosine rows."""
    import pyspark.sql.functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.semantic import (
        cosine_similarity_expr,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, None)],
        "id long, v array<double>",
    )
    q = F.array(F.lit(1.0), F.lit(0.0))
    got = df.select("id", cosine_similarity_expr("v", q).alias("s")).orderBy(
        F.desc("s")
    ).collect()
    assert [r.id for r in got] == [1, 2, 3]  # NULL last, not mid-ranked at 0.0
    assert got[2].s is None
