"""BM25 retrieval: ranking sanity + hand-computed score on a 3-doc corpus."""

import math

import pytest

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
    bm25_topk,
    term_postings,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark window"),
            (2, "spark table"),
            (3, "table row batch"),
        ],
        "doc_id long, text string",
    )


def test_postings_tf_and_doclen(spark, corpus):
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["doc_len"])
        for r in term_postings(corpus).collect()
    }
    assert rows[(1, "spark")] == (2, 3)
    assert rows[(1, "window")] == (1, 3)
    assert rows[(2, "table")] == (1, 2)


def test_only_matching_docs_scored(spark, corpus):
    out = bm25_topk(corpus, ["window"], top_k=10).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_hand_computed_score(spark, corpus):
    # query {window}: df=1, N=3 -> idf = ln((3-1+0.5)/(1+0.5)+1) = ln(8/3)
    # doc 1: tf=1, dl=3, avgdl=(3+2+3)/3=8/3
    # w = idf * (1*2.2)/(1 + 1.2*(0.25 + 0.75*3/(8/3)))
    idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    denom = 1 + 1.2 * (1 - 0.75 + 0.75 * 3 / (8 / 3))
    want = round(idf * 2.2 / denom, 6)
    got = bm25_topk(corpus, ["window"], top_k=1).first()
    assert float(got["score"]) == pytest.approx(want, abs=1e-6)


def test_tf_saturation_ranks_double_hit_higher(spark, corpus):
    out = bm25_topk(corpus, ["spark"], top_k=10).collect()
    assert [r["doc_id"] for r in out][0] == 1  # tf=2 beats tf=1 (longer doc, still wins)
    assert len(out) == 2


def test_empty_query_rejected(spark, corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, [])


def test_null_and_empty_text_do_not_skew_stats(spark):
    base = [(1, "spark spark window"), (2, "spark table"), (3, "table row batch")]
    clean = spark.createDataFrame(base, "doc_id long, text string")
    noisy = spark.createDataFrame(
        base + [(4, None), (5, ""), (6, "   ")], "doc_id long, text string"
    )
    want = [(r["doc_id"], float(r["score"])) for r in bm25_topk(clean, ["spark"]).collect()]
    got = [(r["doc_id"], float(r["score"])) for r in bm25_topk(noisy, ["spark"]).collect()]
    # NULL/empty docs carry no tokens: N, avgdl, and every score unchanged
    assert got == want


def test_repeated_query_terms_deduplicated(spark, corpus):
    a = {r["doc_id"]: float(r["score"]) for r in bm25_topk(corpus, ["spark"]).collect()}
    b = {r["doc_id"]: float(r["score"]) for r in bm25_topk(corpus, ["spark", "spark"]).collect()}
    assert a == b


def test_rrf_fuse_ranks_shared_docs_first(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
        rrf_fuse,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rnk int")
    b = spark.createDataFrame([(20, 1), (40, 2), (10, 3)], "doc_id long, rnk int")
    out = rrf_fuse([a, b], top_k=10).collect()
    order = [r.doc_id for r in out]
    # 20: 1/62+1/61 > 10: 1/61+1/63 > singles 30/40
    assert order[0] == 20 and order[1] == 10
    assert set(order) == {10, 20, 30, 40}
    import pytest as _pytest

    assert out[0].rrf_score == _pytest.approx(1 / 62 + 1 / 61, abs=1e-9)
    assert [r.rnk for r in out] == [1, 2, 3, 4]


def test_rrf_fuse_single_ranking_is_identity_order(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
        rrf_fuse,
    )

    a = spark.createDataFrame([(5, 1), (6, 2), (7, 3)], "doc_id long, rnk int")
    out = rrf_fuse([a], top_k=2).collect()
    assert [(r.doc_id, r.rnk) for r in out] == [(5, 1), (6, 2)]
