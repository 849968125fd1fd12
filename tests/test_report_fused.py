"""Round-13 optimization seams: the fused corpus_quality_report scan
(char_entropy_expr, tagged_token_counts sharing, retain_missing=False
variants) and checkpoint_concurrently — each pinned against the unfused
twin it replaced, so the fusion can never drift from the per-signal
operators the oracle verifies."""

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
    char_entropy_batch,
    char_entropy_expr,
    repetition_stats_batch,
    tagged_token_counts,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    checkpoint_concurrently,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.vocab import (
    unigram_logprob,
)

EDGE_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spam spam spam spam spam"),
    (3, None),
    (4, "   "),
    (5, "a"),
    (6, "line one\nline two\nline one"),
    (7, "đây là một ví dụ"),
    (8, "aaaa bbbb aaaa\tcccc"),
]


def _docs(spark):
    return spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")


def test_char_entropy_expr_matches_batch(spark):
    """The Column twin must agree with char_entropy_batch on every edge
    class (NULL, whitespace-only, single char, newlines in the sorted
    stream, non-ASCII) — it backs the report's fused scan."""
    docs = _docs(spark)
    got = {
        r.doc_id: r.e
        for r in docs.select("doc_id", char_entropy_expr("text").alias("e")).collect()
    }
    want = {r.doc_id: r.entropy for r in char_entropy_batch(docs).collect()}
    assert got == want


def test_repetition_stats_shared_counts_identical(spark):
    """repetition_stats_batch(counts=tagged_token_counts(df)) must equal the
    self-built path row-for-row (the report shares one persisted counts
    frame between repetition and the LM postings)."""
    docs = _docs(spark)
    a = sorted(map(tuple, repetition_stats_batch(docs).collect()))
    cnt = tagged_token_counts(docs)
    b = sorted(map(tuple, repetition_stats_batch(docs, counts=cnt).collect()))
    assert a == b


def test_retain_missing_false_drops_only_tokenless(spark):
    """retain_missing=False returns exactly the token-bearing rows of the
    retained frame, with identical values — the report re-attaches the
    missing docs through its own left join + zero coalesce."""
    docs = _docs(spark)
    tokenless = {3, 4}

    full_rep = {r.doc_id: tuple(r)[1:] for r in repetition_stats_batch(docs).collect()}
    slim_rep = {
        r.doc_id: tuple(r)[1:]
        for r in repetition_stats_batch(docs, retain_missing=False).collect()
    }
    assert set(slim_rep) == set(full_rep) - tokenless
    assert all(full_rep[k] == v for k, v in slim_rep.items())

    full_lp = {r.doc_id: tuple(r)[1:] for r in unigram_logprob(docs).collect()}
    slim_lp = {
        r.doc_id: tuple(r)[1:]
        for r in unigram_logprob(docs, retain_missing=False).collect()
    }
    assert set(slim_lp) == set(full_lp) - tokenless
    assert all(full_lp[k] == v for k, v in slim_lp.items())


def test_tagged_counts_k1_is_a_postings_table(spark):
    """The _k=1 slice of tagged_token_counts must equal term_postings on
    (id, term, tf) — that equality is what lets the report feed
    unigram_logprob from the shared explode."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
        term_postings,
    )

    docs = _docs(spark)
    a = sorted(
        map(
            tuple,
            tagged_token_counts(docs)
            .filter(F.col("_k") == 1)
            .select("doc_id", F.col("_v").alias("term"), F.col("_c").alias("tf"))
            .collect(),
        )
    )
    b = sorted(map(tuple, term_postings(docs).select("doc_id", "term", "tf").collect()))
    assert a == b


def test_checkpoint_concurrently_identity_and_order(spark):
    """Concurrent eager checkpoints must return the same rows as their
    inputs, in input order, and actually be checkpointed (plan truncated to
    an RDD scan) — the ann_recall_at3 overlap rides on this."""
    dfs = [
        spark.range(0, 10).withColumn("tag", F.lit(i)).select("id", "tag")
        for i in range(3)
    ]
    outs = checkpoint_concurrently(dfs)
    assert len(outs) == 3
    for i, (src, out) in enumerate(zip(dfs, outs)):
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, src.collect()))
        assert out.select(F.min("tag")).first()[0] == i
        assert "ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()
    # singleton path (no pool)
    (single,) = checkpoint_concurrently([dfs[0]])
    assert single.count() == 10
