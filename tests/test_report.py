"""corpus_quality_report (operators/report.py): the one-call profile must
agree column-for-column with the individual signal operators it composes —
this is the verification for the rows-only doc_quality_report query."""

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
    char_entropy_batch,
    repetition_stats_batch,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    corpus_quality_report,
    term_postings,
    unigram_logprob,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spam spam spam spam spam"),
            (3, None),
            (4, "   "),
            (5, "đây là một trong những ví dụ của chúng ta"),
        ],
        "doc_id long, text string",
    )


def test_report_matches_component_operators(spark):
    docs = _docs(spark)
    rep = {r.doc_id: r for r in corpus_quality_report(docs).collect()}
    assert set(rep) == {1, 2, 3, 4, 5}  # one row per doc, always

    ent = {r.doc_id: r.entropy for r in char_entropy_batch(docs).collect()}
    gopher = {r.doc_id: r for r in repetition_stats_batch(docs).collect()}
    lp = {r.doc_id: r.bits_per_token for r in unigram_logprob(docs).collect()}
    for d in rep.values():
        assert d.entropy == ent[d.doc_id]
        assert d.dup_token_ratio == gopher[d.doc_id].dup_token_ratio
        assert d.top_token_ratio == gopher[d.doc_id].top_token_ratio
        assert d.bits_per_token == lp[d.doc_id]
    # scan-side signals sanity
    assert rep[3].n_chars == 0 and rep[3].n_tokens == 0
    assert rep[2].top_token_ratio == 1.0  # all-same-token doc
    assert rep[1].lang_guess == "en"
    assert rep[5].lang_guess == "vi"


def test_report_accepts_shared_postings(spark):
    docs = _docs(spark)
    post = term_postings(docs).persist()
    try:
        a = {
            (r.doc_id, r.bits_per_token)
            for r in corpus_quality_report(docs, postings=post).collect()
        }
        b = {
            (r.doc_id, r.bits_per_token)
            for r in corpus_quality_report(docs).collect()
        }
        assert a == b
    finally:
        post.unpersist()
