"""Round-3 additions: heavy-hitter n-grams, fractional-epoch mixing,
char entropy, SemDeDup semantic dedup. Oracle parity runs in
test_oracle_parity.py; these pin operator semantics and edge cases."""

import math

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
    char_entropy_batch,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.sampling import (
    epoch_upsample,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
    ivf_fixed_centroids,
    semantic_dedup,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.vocab import (
    top_ngrams,
)


# --- top_ngrams -----------------------------------------------------------


def test_top_ngrams_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # 'a b' x3, 'b a' x2
            (2, "a b c"),  # 'a b' x1, 'b c' x1
            (3, None),
            (4, "single"),  # no bigram
        ],
        "doc_id long, text string",
    )
    got = {r.ngram: (r.n_occurrences, r.n_docs) for r in top_ngrams(docs, n=2, k=10).collect()}
    assert got == {"a b": (4, 2), "b a": (2, 1), "b c": (1, 1)}
    # deterministic cut: equal counts break on the ngram string
    top = top_ngrams(docs, n=2, k=2).collect()
    assert [r.ngram for r in top] == ["a b", "b a"]


def test_top_ngrams_min_doc_freq_and_case(spark):
    docs = spark.createDataFrame(
        [(1, "The cat"), (2, "the CAT"), (3, "a dog")], "doc_id long, text string"
    )
    got = {r.ngram: r.n_docs for r in top_ngrams(docs, n=2, k=10, min_doc_freq=2).collect()}
    assert got == {"the cat": 2}  # lowercased; 'a dog' dropped by doc-freq


def test_top_ngrams_unigrams_keep_multiplicity(spark):
    docs = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    got = {r.ngram: r.n_occurrences for r in top_ngrams(docs, n=1, k=10).collect()}
    assert got == {"x": 2, "y": 1}


# --- epoch_upsample -------------------------------------------------------


def test_epoch_upsample_integer_weights(spark):
    docs = spark.createDataFrame(
        [(i, "s1" if i < 5 else "s2") for i in range(10)], "doc_id long, source string"
    )
    up = epoch_upsample(docs, "source", {"s1": 3.0, "s2": 0.0}).collect()
    # s1 docs exactly 3 copies (epoch 0,1,2), s2 dropped entirely
    assert len(up) == 15
    assert {r.source for r in up} == {"s1"}
    epochs = sorted(r.epoch for r in up if r.doc_id == 0)
    assert epochs == [0, 1, 2]


def test_epoch_upsample_fractional_is_deterministic_and_plausible(spark):
    docs = spark.createDataFrame([(i, "s") for i in range(400)], "doc_id long, source string")
    a = epoch_upsample(docs, "source", {"s": 1.5}).count()
    b = epoch_upsample(docs, "source", {"s": 1.5}).repartition(7).count()
    assert a == b  # partitioning-independent
    # expectation 600; md5-uniform keeps realized count near it
    assert 520 <= a <= 680
    # weight < 1 downsamples with the same rule
    down = epoch_upsample(docs, "source", {"s": 0.25}).count()
    assert 60 <= down <= 140


def test_epoch_upsample_rejects_negative(spark):
    docs = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    for bad in ({"s": -1.0}, None):
        try:
            if bad is None:
                epoch_upsample(docs, "source", {}, default_epochs=-0.5)
            else:
                epoch_upsample(docs, "source", bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


# --- char_entropy_batch ---------------------------------------------------


def test_char_entropy_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, ""), (4, None), (5, "abcd")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars, r.entropy) for r in char_entropy_batch(docs).collect()}
    assert got[1] == (4, 0.0)  # single symbol -> zero entropy
    assert got[2] == (2, 1.0)  # two equiprobable symbols -> 1 bit
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)
    assert got[5] == (4, 2.0)  # four equiprobable symbols -> 2 bits
    # mixed case is case-sensitive: 'aA' has 2 symbols
    m = char_entropy_batch(
        spark.createDataFrame([(1, "aA")], "doc_id long, text string")
    ).collect()[0]
    assert m.entropy == 1.0


def test_char_entropy_matches_closed_form(spark):
    text = "aab"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    h = char_entropy_batch(docs).collect()[0].entropy
    expect = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(h - round(expect, 6)) < 1e-9


# --- semantic_dedup -------------------------------------------------------


def _vec_rows(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_keeps_earliest_drops_similar(spark):
    # centroids: axis-aligned cells; docs 1/2 identical direction (cos=1),
    # doc 3 orthogonal (different cell), doc 4 same cell as 1 but dissimilar
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.1]),
        (2, [2.0, 0.2]),  # same direction as 1 -> dropped
        (3, [0.0, 1.0]),  # other cell -> kept
        (4, [1.0, -5.0]),  # cell 0 (closer to [1,0] than [0,1])? verify below
    ]
    out = semantic_dedup(_vec_rows(spark, rows), cents, threshold=0.99)
    kept = {r.vec_id for r in out.collect()}
    assert 1 in kept and 3 in kept
    assert 2 not in kept
    assert 4 in kept  # dissimilar to doc 1 even if co-located


def test_semantic_dedup_cell_boundary_blindness(spark):
    # identical-direction vectors in DIFFERENT cells are both kept — the
    # documented SemDeDup approximation (recall dial = cluster count)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(1, [1.0, 0.9]), (2, [0.9, 1.0])]  # cos ~1 but straddle cells
    out = semantic_dedup(_vec_rows(spark, rows), cents, threshold=0.95)
    assert {r.vec_id for r in out.collect()} == {1, 2}


def test_semantic_dedup_empty_and_all_dup(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    empty = _vec_rows(spark, [])
    assert semantic_dedup(empty, cents).count() == 0
    rows = [(i, [1.0, 0.0]) for i in range(5)]
    out = semantic_dedup(_vec_rows(spark, rows), cents, threshold=0.99).collect()
    assert [r.vec_id for r in out] == [0]  # only the min id survives


def test_semantic_dedup_single_shuffle_pair_stage(spark):
    # the pair join must key on cell (no cartesian): assert no
    # BroadcastNestedLoopJoin / CartesianProduct in the plan
    cents = ivf_fixed_centroids(dim=4, n_lists=2, seed=7)
    vecs = _vec_rows(spark, [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(10)])
    plan = (
        semantic_dedup(vecs, cents, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- learned-centroid SemDeDup composition (ivf_build_index -> semantic_dedup)


def _clustered_vectors(spark, n_clusters=4, per_cluster=60, dim=16, seed=3):
    """Synthetic vectors in tight, well-separated clusters: center c is
    10*e_c (axis-aligned, far apart), members are center + small seeded
    noise. Each cluster's last member duplicates its first (near-exactly)
    so semantic dedup has something to drop."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c] = 10.0
        base = center + rng.normal(0, 0.05, size=(per_cluster, dim))
        base[-1] = base[0] + rng.normal(0, 1e-4, size=dim)  # planted near-dup
        for i, v in enumerate(base):
            rows.append((c * per_cluster + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_learned_centroids_bound_the_cell_histogram(spark):
    """ivf_build_index's k-means centroids must recover the planted cluster
    structure: the cell histogram's top row — the bound on semantic_dedup's
    quadratic within-cell stage — stays at one planted cluster's size, not
    a megacell union of several."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
        cell_histogram,
        ivf_assign,
        ivf_build_index,
    )

    vecs = _clustered_vectors(spark, n_clusters=4, per_cluster=60)
    _, centroids = ivf_build_index(vecs, n_lists=4, fit_sample_size=240)
    hist = cell_histogram(ivf_assign(vecs, centroids)).collect()
    assert len(hist) == 4
    assert hist[0]["n"] == 60  # biggest cell == one planted cluster
    assert sum(r["n"] for r in hist) == 240


def test_semantic_dedup_with_learned_centroids_drops_planted_dups(spark):
    """The composition the training example runs: learned centroids feed
    semantic_dedup; each planted near-duplicate (cosine ~1 to its cluster's
    first member) dies, everything else survives at a threshold the
    intra-cluster noise cannot reach."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        unpersist_inputs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
        ivf_build_index,
    )

    vecs = _clustered_vectors(spark, n_clusters=4, per_cluster=60)
    _, centroids = ivf_build_index(vecs, n_lists=4, fit_sample_size=240)
    out = semantic_dedup(vecs, centroids, threshold=0.9999995)
    kept = {r["vec_id"] for r in out.select("vec_id").collect()}
    unpersist_inputs(out)
    planted = {c * 60 + 59 for c in range(4)}
    assert planted.isdisjoint(kept)
    assert kept == set(range(240)) - planted
