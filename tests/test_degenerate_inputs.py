"""Degenerate-input sweep: every core operator family on (a) an EMPTY
corpus, (b) a single whitespace/NULL-text doc. At 100 TB an empty partition
or an all-null shard is a certainty, not an edge case — operators must
return empty/zero results, never throw."""

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
    char_entropy_batch,
    repetition_stats_batch,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    assign_split,
    bm25_topk,
    connected_components,
    exact_dedup,
    feature_hash_embed,
    pack_sequences,
    simhash_near_dup_pairs,
    tfidf_top_terms,
    unigram_logprob,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.chunking import (
    chunk_fixed_tokens,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    minhash_dedup_pairs,
)

SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], SCHEMA)


@pytest.fixture(scope="module")
def blank(spark):
    # one NULL text, one whitespace-only — both token-less
    return spark.createDataFrame([(1, None), (2, "   ")], SCHEMA)


def test_empty_corpus_yields_empty_everywhere(empty):
    assert exact_dedup(empty).count() == 0
    assert chunk_fixed_tokens(empty, 10).count() == 0
    assert simhash_near_dup_pairs(empty).count() == 0
    assert minhash_dedup_pairs(empty).count() == 0
    assert tfidf_top_terms(empty).count() == 0
    assert unigram_logprob(empty).count() == 0
    assert feature_hash_embed(empty).count() == 0
    assert bm25_topk(empty, ["x"]).count() == 0
    assert repetition_stats_batch(empty).count() == 0
    assert char_entropy_batch(empty).count() == 0
    assert assign_split(empty, "doc_id").count() == 0
    lens = empty.select("doc_id", F.lit(1).alias("n_tokens"))
    assert pack_sequences(lens, max_tokens=10, n_shards=2).count() == 0


def test_empty_edges_all_singletons(spark, empty, blank):
    edges = spark.createDataFrame([], "id1 long, id2 long")
    comp = connected_components(edges, nodes=blank, id_col="doc_id").collect()
    assert {(r.doc_id, r.component) for r in comp} == {(1, 1), (2, 2)}


def test_tokenless_docs_keep_rows_where_contracted(blank):
    # per-doc signal operators keep one row per input doc with zeros
    ent = {r.doc_id: r for r in char_entropy_batch(blank).collect()}
    assert ent[1].n_chars == 0 and ent[1].entropy == 0.0
    rep = {r.doc_id: r for r in repetition_stats_batch(blank).collect()}
    assert rep[1].dup_token_ratio == 0.0 and rep[2].top_token_ratio == 0.0
    lp = {r.doc_id: r for r in unigram_logprob(blank).collect()}
    assert lp[1].n_tokens == 0 and lp[2].bits_per_token == 0.0
    # splits are defined for every doc, text or not
    assert assign_split(blank, "doc_id").count() == 2


def test_tokenless_docs_vanish_where_contracted(blank):
    # postings-based extractors and pair generators emit nothing
    assert tfidf_top_terms(blank).count() == 0
    assert feature_hash_embed(blank).count() == 0
    assert simhash_near_dup_pairs(blank).count() == 0
    assert minhash_dedup_pairs(blank).count() == 0
    assert bm25_topk(blank, ["x"]).count() == 0


def test_single_real_doc_is_a_fixed_point(spark):
    one = spark.createDataFrame([(7, "just one document here")], SCHEMA)
    assert exact_dedup(one).count() == 1
    assert simhash_near_dup_pairs(one).count() == 0  # no pair partner
    top = tfidf_top_terms(one, k=10).collect()
    # sole doc: every term has df=1, tf=1 -> identical tfidf, term-ordered
    assert [r.term for r in top] == sorted(r.term for r in top)
    lp = unigram_logprob(one).collect()[0]
    # 4 distinct terms, each p=1/4 -> exactly 2 bits/token
    assert lp.bits_per_token == pytest.approx(2.0)


def test_more_dedup_ops_on_blank(blank, empty):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        ngram_jaccard_pairs,
        winnowing_fingerprints,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        span_dedup,
    )

    assert ngram_jaccard_pairs(blank).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert winnowing_fingerprints(blank).count() == 0
    assert winnowing_fingerprints(empty).count() == 0
    # span dedup keeps the rows (text preserved verbatim when token-less)
    out = {r.doc_id: r.text for r in span_dedup(blank, span_tokens=5).collect()}
    assert set(out) == {1, 2}


def test_summarize_approaches_keep_row_per_doc(spark, blank, empty):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
        mapreduce_summarize,
    )

    s = MockSummarizer(16)
    assert mapreduce_summarize(empty, s, chunk_size=10, chunk_overlap=2,
                               token_max=20).count() == 0
    out = mapreduce_summarize(blank, s, chunk_size=10, chunk_overlap=2, token_max=20)
    assert out.count() == 2  # one row per input doc, even token-less
