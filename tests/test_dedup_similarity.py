from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signature_expr,
    ngram_jaccard_pairs,
    shingles_expr,
    simhash_expr,
    simhash_near_dup_pairs,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
    cosine_topk,
    random_hyperplane_lsh_topk,
)

LONG_A = " ".join(f"tok{i}" for i in range(200))
LONG_A_NEAR = " ".join(f"tok{i}" for i in range(198)) + " zzz yyy"  # ~99% shingles shared
LONG_B = " ".join(f"other{i}" for i in range(200))


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "different")], ["doc_id", "text"]
    )
    out = exact_dedup(df).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_copies) for r in out] == [(1, 2), (3, 1)]


def test_shingles_null_text_yields_empty_array(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = df.select(shingles_expr("text", 3).alias("sh")).first()
    assert row.sh == []  # not NULL: size()/array-fn callers stay safe


def test_shingles_and_minhash(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "x y")], ["doc_id", "text"])
    rows = df.select(
        "doc_id", shingles_expr("text", 3).alias("sh")
    ).orderBy("doc_id").collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []  # shorter than shingle width
    sig = df.select(minhash_signature_expr(shingles_expr("text", 3), 8).alias("s")).first()
    assert len(sig.s) == 8


def test_minhash_lsh_finds_near_dups(spark):
    df = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_A_NEAR), (3, LONG_B)], ["doc_id", "text"]
    )
    pairs = minhash_dedup_pairs(df, threshold=0.5).collect()
    assert [(p.id1, p.id2) for p in pairs] == [(1, 2)]
    assert pairs[0].est_jaccard > 0.7


def test_lsh_band_table_carries_no_signature(spark):
    """The band self-join input must shuffle ids + band keys ONLY — carrying
    the 64-long signature per (doc x band) row multiplies the band shuffle
    width by n_bands (the round-1 verdict's scale hazard #2)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        lsh_band_table,
        minhash_signatures,
    )

    sigs = minhash_signatures(
        spark.createDataFrame([(1, LONG_A), (2, LONG_B)], ["doc_id", "text"])
    )
    band = lsh_band_table(sigs)
    assert band.columns == ["doc_id", "band_idx", "band_hash"]
    assert band.count() == 2 * 16


def test_simhash_signatures_match_expr(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        simhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_B), (3, "one two"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    via_agg = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    via_expr = {
        r.doc_id: r.s
        for r in df.select("doc_id", simhash_expr("text").alias("s")).collect()
    }
    for k, v in via_agg.items():
        assert v == via_expr[k], k
    # token-less docs are excluded (a shared sentinel would pair all empty
    # docs as near-duplicates and create a quadratic hot band)
    assert 4 not in via_agg and 5 not in via_agg


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_A_NEAR), (3, LONG_B)], ["doc_id", "text"]
    )
    sigs = df.select("doc_id", simhash_expr("text").alias("s")).orderBy("doc_id").collect()
    assert sigs[0].s != sigs[2].s  # different content -> different signature
    pairs = simhash_near_dup_pairs(df, max_hamming=16).collect()
    assert (1, 2) in [(p.id1, p.id2) for p in pairs]
    assert (1, 3) not in [(p.id1, p.id2) for p in pairs]


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "q w e r t")], ["doc_id", "text"]
    )
    out = ngram_jaccard_pairs(df, top_k=5).collect()
    assert (out[0].id1, out[0].id2, out[0].jaccard) == (1, 2, 1.0)


def test_ngram_jaccard_pair_gen_arms_identical(spark):
    """r14 optimization pin: the grouped (posting-list collect + in-row
    posexplode/slice) pair generation must emit exactly the selfjoin arm's
    rows for every parameter combination — doc-freq cap, threshold, and
    uncapped — including stop-shingle drops and singleton lists."""
    rows = [
        (1, "x y z w v u"),          # near-dup cluster with 2
        (2, "x y z w v q"),
        (3, "common common common a b c"),
        (4, "common common common d e f"),
        (5, "solo tokens only here now"),
        (6, None),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for kw in (
        {},
        {"max_doc_freq": 1},
        {"max_doc_freq": 3},
        {"threshold": 0.2},
        {"max_doc_freq": 3, "threshold": 0.1},
        {"shingle_n": 2},
    ):
        a = sorted(
            tuple(r) for r in ngram_jaccard_pairs(df, pair_gen="selfjoin", **kw).collect()
        )
        b = sorted(
            tuple(r) for r in ngram_jaccard_pairs(df, pair_gen="grouped", **kw).collect()
        )
        assert a == b, (kw, a, b)


def _vec_df(spark):
    # 4 orthogonal-ish clusters in 4-d
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.9, 0.1, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(spark):
    corpus = _vec_df(spark)
    queries = corpus.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).filter("query_id = 0")
    out = cosine_topk(queries, corpus, k=2).orderBy("rnk").collect()
    assert [r.neighbor_id for r in out] == [1, 2]  # nearest is same-cluster vec 1


def test_lsh_topk_recovers_clustered_neighbors(spark):
    # clustered data (the regime LSH is for): 5 centers x 20 near-copies.
    # same-cluster cosine ~0.99 -> same/adjacent SRP bucket with multi-probe.
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((5, 16))
    rows = []
    for i in range(100):
        c = centers[i % 5]
        v = c + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = corpus.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(queries, corpus, k=1).filter("rnk = 1").collect()
    }
    ann = {
        r.query_id: r.neighbor_id
        for r in random_hyperplane_lsh_topk(queries, corpus, dim=16, k=1, n_planes=8)
        .filter("rnk = 1")
        .collect()
    }
    hits = sum(1 for q, n in exact.items() if ann.get(q) == n)
    assert hits >= 4, f"ANN recall too low: {ann} vs {exact}"


def test_lsh_topk_valid_on_uniform_embeddings(spark, sf_dir):
    # uniform random vectors have no cluster structure -> low recall is
    # expected; assert the operator still returns well-formed, correctly
    # ranked results drawn from the probed buckets.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = random_hyperplane_lsh_topk(queries, emb, dim=64, k=3, n_planes=8)
    rows = out.collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.sim, r.neighbor_id))
    for q, lst in by_q.items():
        lst.sort()
        sims = [s for _, s, _ in lst]
        assert sims == sorted(sims, reverse=True)  # rank order matches sim
        assert all(n != q for _, _, n in lst)  # self excluded


def test_winnowing_shared_substring_guarantee(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    # docs 1/2 share a substring of length >= k + w - 1 = 11 -> must share
    # a fingerprint; doc 3 is disjoint content; doc 4 shorter than k but
    # >= k after normalization check; doc 5 too short -> no rows
    shared = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [
            (1, f"AAA {shared} one two three"),
            (2, f"completely different prefix {shared}"),
            (3, "unrelated words entirely distinct content here"),
            (4, "exactlyok"),
            (5, "short"),
        ],
        "doc_id long, text string",
    )
    out = winnowing_fingerprints(df, k=8, w=4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared >= k+w-1 substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    assert len(by_doc.get(4, set())) == 1  # single window (fewer than w grams)
    assert 5 not in by_doc  # shorter than k -> no fingerprints


def test_winnowing_zero_shuffle_plan(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    df = spark.createDataFrame([(1, "some words here repeated words")], "doc_id long, text string")
    plan = winnowing_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan


def test_winnowing_normalization_and_null(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    # case + whitespace normalization: same fingerprints either way
    df = spark.createDataFrame(
        [(1, "The  Quick\tBrown   Fox Jumps High"), (2, "the quick brown fox jumps high"), (3, None)],
        "doc_id long, text string",
    )
    out = winnowing_fingerprints(df, k=8, w=4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] == by_doc[2]
    assert 3 not in by_doc


def test_winnowing_xxhash_twin_same_guarantees(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    shared = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [
            (1, f"AAA {shared} one two three"),
            (2, f"completely different prefix {shared}"),
            (3, "unrelated words entirely distinct content here"),
        ],
        "doc_id long, text string",
    )
    # default (xxhash64) keeps the k+w-1 shared-substring guarantee and the
    # zero-shuffle plan; bad gram_hash values fail loudly
    out = winnowing_fingerprints(df, k=8, w=4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[2] & by_doc[3])
    plan = winnowing_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gram_hash"):
        winnowing_fingerprints(df, gram_hash="sha1")


def test_lsh_band_table_rejects_bad_band_params(spark):
    import pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        lsh_band_table,
        minhash_signatures,
    )

    sigs = minhash_signatures(
        spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"]),
        n_hashes=16,
    )
    with pytest.raises(ValueError, match="n_bands"):
        lsh_band_table(sigs, "doc_id", "minhash", n_bands=32, n_hashes=16)
    with pytest.raises(ValueError, match="n_bands"):
        lsh_band_table(sigs, "doc_id", "minhash", n_bands=3, n_hashes=16)


def test_lsh_band_table_rejects_short_signatures_at_runtime(spark):
    """16-hash signatures banded with the 64-hash default would slice []
    for the tail bands — a constant band hash = one giant bucket = silent
    O(n^2) self-join. Must raise, not degrade."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        lsh_band_table,
        minhash_signatures,
    )

    sigs = minhash_signatures(
        spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"]),
        n_hashes=16,
    )
    bad = lsh_band_table(sigs, "doc_id", "minhash", n_bands=16, n_hashes=64)
    with pytest.raises(Exception, match="n_hashes=64"):
        bad.collect()


def test_hamming_pairs_single_full_width_band(spark):
    """n_bands=1, bits=64 passes validation and must WORK: the full
    signature is the band key (the 2^64-1 mask literal would overflow a
    signed long)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    sigs = spark.createDataFrame(
        [(1, 7), (2, 7), (3, -12345)], ["doc_id", "simhash"]
    )
    got = hamming_near_dup_pairs(sigs, n_bands=1, bits=64, max_hamming=0).collect()
    assert [(r.id1, r.id2) for r in got] == [(1, 2)]


def test_ngram_jaccard_unpersist_hook_releases_the_cached_index(spark):
    """Under max_doc_freq the shingle frame is rebound after persist(); the
    hook must hold the PERSISTED frame, or unpersist_inputs no-ops and the
    cache entry leaks for the session."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        ngram_jaccard_pairs,
        unpersist_inputs,
    )

    docs = spark.createDataFrame(
        [(i, "w%d common text body here" % i) for i in range(6)],
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(docs, shingle_n=2, max_doc_freq=10)
    pairs.count()  # materialize (and populate the cache)
    cached = pairs._persisted_inputs[0]
    assert cached.storageLevel.useMemory  # the hook holds the cached frame
    unpersist_inputs(pairs)
    assert not cached.storageLevel.useMemory
