"""Plan shapes for the TF-IDF / unigram-LM operators (operators/vocab.py):
value parity lives in test_oracle_parity.py / test_tfidf_logprob.py; these
assert the plans SCALE — the vocabulary map joins back broadcast by default
(and degrades to a shuffle join, not a nested loop, when the vocabulary is
declared too big to broadcast), the scalar totals stay 1-row broadcasts,
and the per-doc top-k is a window partitioned by document, never a global
sort."""

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.vocab import (
    tfidf_top_terms,
    unigram_logprob,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_tfidf_broadcasts_vocab_by_default(spark):
    plan = _plan(tfidf_top_terms(_docs(spark)))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_vocab_join_degrades_to_shuffle_not_nested_loop(spark):
    plan = _plan(tfidf_top_terms(_docs(spark), broadcast_vocab=False))
    # the term-keyed df-map join must stay an equi-join (sort-merge or
    # shuffled-hash) when broadcasting is off — never a nested loop; the
    # only nested-loop allowed is the legitimate 1-row n_docs crossJoin
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_tfidf_topk_is_doc_partitioned_window(spark):
    plan = _plan(tfidf_top_terms(_docs(spark)))
    assert "row_number" in plan
    # window partition key is the doc id -> no global sort of all postings
    assert "doc_id" in plan.split("Window")[1][:400]


def test_unigram_logprob_broadcasts_lm(spark):
    plan = _plan(unigram_logprob(_docs(spark)))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_unigram_logprob_shuffle_fallback(spark):
    plan = _plan(unigram_logprob(_docs(spark), broadcast_vocab=False))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_operators_compose_on_shared_postings(spark):
    # both consumers accept the same persisted postings frame: the explode
    # is paid once per pipeline, not once per signal
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
        term_postings,
    )

    docs = _docs(spark)
    post = term_postings(docs).persist()
    try:
        a = tfidf_top_terms(docs, k=1, postings=post)
        b = unigram_logprob(docs, postings=post)
        joined = a.join(b, "doc_id")
        assert joined.count() == 2
        assert "InMemoryTableScan" in _plan(joined)
    finally:
        post.unpersist()
