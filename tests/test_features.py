"""Feature-hashing embeddings (operators/features.py): bucket math, L2
normalization, sparse->dense round trip, and composition with the cosine
similarity family. Oracle parity runs in test_oracle_parity.py."""

import math

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.features import (
    feature_hash_embed,
    to_dense_vector,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana"),
            (3, "cherry"),
            (4, None),
            (5, "   "),
        ],
        "doc_id long, text string",
    )


def test_unit_norm_and_sparsity(spark):
    out = feature_hash_embed(_docs(spark), dims=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc with tokens has unit L2 norm (within round-6 tolerance)
    for doc, rows in by_doc.items():
        assert abs(sum(r.weight**2 for r in rows) - 1.0) < 1e-4, doc
        assert all(0 <= r.dim < 16 for r in rows)
    # token-less docs emit nothing
    assert set(by_doc) == {1, 2, 3}


def test_same_unigram_mix_same_direction(spark):
    # doc 10 is doc 11 repeated twice: same term distribution -> identical
    # normalized embedding (the scale invariance L2 normalization buys)
    docs = spark.createDataFrame(
        [(10, "a b a b"), (11, "a b")], "doc_id long, text string"
    )
    out = feature_hash_embed(docs, dims=8).collect()
    v = {}
    for r in out:
        v.setdefault(r.doc_id, {})[r.dim] = r.weight
    assert v[10] == v[11]


def test_unnormalized_weights_are_tf_sums(spark):
    docs = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    out = feature_hash_embed(docs, dims=4, normalize=False).collect()
    assert sum(r.weight for r in out) == 3.0  # raw tf mass preserved


def test_dense_round_trip(spark):
    docs = _docs(spark)
    sparse = feature_hash_embed(docs, dims=16)
    dense = {r.doc_id: r.embedding for r in to_dense_vector(sparse, 16).collect()}
    svals = {}
    for r in sparse.collect():
        svals.setdefault(r.doc_id, {})[r.dim] = r.weight
    assert set(dense) == set(svals)
    for doc, emb in dense.items():
        assert len(emb) == 16
        for i, x in enumerate(emb):
            assert x == pytest.approx(svals[doc].get(i, 0.0))


def test_cosine_composes_with_similarity_family(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a a b"), (3, "zebra yak")], "doc_id long, text string"
    )
    sparse = feature_hash_embed(docs, dims=32)
    a = sparse.select(F.col("doc_id").alias("ida"), "dim", F.col("weight").alias("wa"))
    b = sparse.select(F.col("doc_id").alias("idb"), "dim", F.col("weight").alias("wb"))
    cos = (
        a.join(b, "dim")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 6).alias("cos"))
        .collect()
    )
    got = {(r.ida, r.idb): r.cos for r in cos}
    assert got[(1, 2)] == pytest.approx(1.0)  # identical docs
    if (1, 3) in got:  # only if a bucket collides
        assert got[(1, 3)] < 1.0


def test_dims_validation(spark):
    with pytest.raises(ValueError):
        feature_hash_embed(_docs(spark), dims=0)


def test_to_dense_vector_dims_validation(spark):
    sparse = feature_hash_embed(_docs(spark), dims=16)
    with pytest.raises(ValueError):
        to_dense_vector(sparse, 0)
