"""TF-IDF keyword extraction + corpus-unigram-LM perplexity scoring
(operators/vocab.py round-3 additions). Oracle parity runs in
test_oracle_parity.py; these pin operator semantics and edge cases."""

import math

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
    term_postings,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.vocab import (
    tfidf_top_terms,
    unigram_logprob,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common common common"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )


# --- tfidf_top_terms ------------------------------------------------------


def test_tfidf_scores_and_ranking(spark):
    out = tfidf_top_terms(_docs(spark), k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # N = 3 docs with tokens. df: apple 1, banana 2, cherry 1, common 3.
    idf = lambda df: math.log((3 + 1.0) / (df + 1.0)) + 1.0
    d1 = {r.term: (r.rank, r.tf, r.tfidf) for r in by_doc[1]}
    assert d1["apple"][0] == 1 and d1["apple"][1] == 2
    assert d1["apple"][2] == round(2 * idf(1), 6)
    assert d1["banana"][2] == round(1 * idf(2), 6)
    assert d1["common"][2] == round(1 * idf(3), 6)
    # rank order within doc 1: apple (highest), then banana, then common
    assert [r.term for r in sorted(by_doc[1], key=lambda r: r.rank)] == [
        "apple",
        "banana",
        "common",
    ]
    # tokenless docs yield no keyword rows
    assert 4 not in by_doc and 5 not in by_doc


def test_tfidf_tie_breaks_on_term(spark):
    docs = spark.createDataFrame([(1, "zeta alpha")], "doc_id long, text string")
    out = sorted(tfidf_top_terms(docs, k=2).collect(), key=lambda r: r.rank)
    # identical tf and df -> identical tfidf; alphabetical term order wins
    assert [r.term for r in out] == ["alpha", "zeta"]
    assert out[0].tfidf == out[1].tfidf


def test_tfidf_k_cut_and_prebuilt_postings(spark):
    docs = _docs(spark)
    post = term_postings(docs).persist()
    try:
        out = tfidf_top_terms(docs, k=1, postings=post).collect()
        assert {r.doc_id for r in out} == {1, 2, 3}
        assert all(r.rank == 1 for r in out)
        winners = {r.doc_id: r.term for r in out}
        assert winners[1] == "apple"  # tf=2, rare
        assert winners[3] == "common"  # only term
    finally:
        post.unpersist()


# --- unigram_logprob ------------------------------------------------------


def test_unigram_logprob_matches_hand_math(spark):
    out = {r.doc_id: r for r in unigram_logprob(_docs(spark)).collect()}
    # corpus counts: apple 2, banana 2, cherry 1, common 5 -> T = 10
    bits = lambda c: math.log2(10) - math.log2(c)
    d1 = (2 * bits(2) + 1 * bits(2) + 1 * bits(5)) / 4
    d3 = bits(5)
    assert out[1].n_tokens == 4
    assert abs(out[1].bits_per_token - round(d1, 6)) < 1e-9
    assert abs(out[3].bits_per_token - round(d3, 6)) < 1e-9
    # every input doc keeps a row; tokenless docs score (0, 0.0)
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[4].n_tokens == 0 and out[4].bits_per_token == 0.0
    assert out[5].n_tokens == 0 and out[5].bits_per_token == 0.0


def test_unigram_logprob_tails_separate(spark):
    # a doc made of the corpus's most common word scores fewer bits than a
    # doc made of hapaxes — the two quality-gate tails order correctly
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "xylophone quixotic"), (3, "the the")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bits_per_token for r in unigram_logprob(docs).collect()}
    assert out[1] < out[2]
    assert out[1] == out[3]  # same unigram -> same bits/token


def test_token_weighted_mean_bits_equals_corpus_entropy(spark):
    # Identity: the token-weighted mean of per-doc bits/token IS the corpus
    # unigram entropy H = log2(T) - (1/T)*sum_w c_w*log2(c_w) — each token
    # contributes -log2 p(w) exactly once on both sides of the rollup.
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "b c d"), (3, "a d d d e")],
        "doc_id long, text string",
    )
    out = unigram_logprob(docs).collect()
    total = sum(r.n_tokens for r in out)
    weighted = sum(r.n_tokens * r.bits_per_token for r in out) / total
    counts = {}
    for _, text in [(1, "a a b c"), (2, "b c d"), (3, "a d d d e")]:
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
    T = sum(counts.values())
    H = math.log2(T) - sum(c * math.log2(c) for c in counts.values()) / T
    assert abs(weighted - H) < 1e-5
