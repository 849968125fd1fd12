from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    bucket_by_token_budget,
    bucket_running_sum,
    chunk_documents,
    chunk_fixed_tokens,
    collapse_until_fits,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.chunking import (
    recursive_split_text,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
)


def test_recursive_split_respects_budget_and_order():
    text = ("para one word " * 30 + "\n\n") * 5  # 5 paras, 120 tokens each
    chunks = recursive_split_text(text, chunk_size=150, chunk_overlap=0)
    assert len(chunks) >= 2
    for c in chunks:
        assert len(c.split()) <= 150
    # all content preserved in order (no overlap)
    joined = " ".join(chunks).split()
    assert joined == text.split()


def test_recursive_split_overlap_carries_context():
    text = "\n\n".join("sent %d words here now" % i for i in range(40))
    chunks = recursive_split_text(text, chunk_size=50, chunk_overlap=10)
    assert len(chunks) >= 2
    # with overlap, chunk i+1 starts with the tail of chunk i
    tail = " ".join(chunks[0].split()[-5:])
    assert tail in chunks[1]


def test_recursive_split_small_doc_single_chunk():
    assert recursive_split_text("tiny doc", 100, 10) == ["tiny doc"]
    assert recursive_split_text("", 100, 10) == []


def test_recursive_split_separator_hierarchy():
    # one paragraph far over budget -> falls back to sentence separators;
    # sentence boundaries (not mid-sentence cuts) shape the chunks
    sentences = ["word " * 30 + "." for _ in range(6)]
    text = " ".join(sentences)  # single paragraph, ~186 tokens
    chunks = recursive_split_text(text, chunk_size=80, chunk_overlap=0)
    assert len(chunks) >= 2
    for c in chunks:
        assert len(c.split()) <= 80
        assert c.rstrip().endswith(".")  # cut at sentence boundaries


def test_recursive_split_oversize_unsplittable_token():
    # a single "word" longer than the budget must still come through
    # (own chunk), never dropped or infinitely recursed
    text = "short start " + "x" * 50 + " tail words"
    chunks = recursive_split_text(text, chunk_size=2, chunk_overlap=0)
    joined = " ".join(chunks)
    assert "x" * 50 in joined
    assert "tail" in joined


def test_chunk_documents_explodes_in_order(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 500), (2, "tiny")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_size=100).orderBy("doc_id", "chunk_idx")
    rows = out.collect()
    d1 = [r for r in rows if r.doc_id == 1]
    d2 = [r for r in rows if r.doc_id == 2]
    assert [r.chunk_idx for r in d1] == list(range(len(d1)))
    assert len(d1) == 5 and all(r.n_tokens <= 100 for r in d1)
    assert len(d2) == 1 and d2[0].chunk == "tiny"


def test_chunk_fixed_tokens_matches_python(spark):
    docs = spark.createDataFrame([(1, " ".join(str(i) for i in range(250)))], ["doc_id", "text"])
    rows = chunk_fixed_tokens(docs, 100).orderBy("chunk_idx").collect()
    assert [r.n_tokens for r in rows] == [100, 100, 50]
    assert rows[1].chunk.split()[0] == "100"


def test_bucket_by_token_budget_is_greedy(spark):
    # reference split_list_of_docs semantics: new group when adding overflows
    sizes = [400, 400, 300, 900, 100, 1200, 50]
    df = spark.createDataFrame(
        [(1, i, f"c{i}", s) for i, s in enumerate(sizes)],
        ["doc_id", "chunk_idx", "text", "n_tokens"],
    )
    rows = bucket_by_token_budget(df, 1000).orderBy("chunk_idx").collect()
    # greedy: [400,400]=800, +300 would be 1100 -> new; [300,900]>1000 -> 900 new...
    expected = [0, 0, 1, 2, 2, 3, 4]
    assert [r.group_id for r in rows] == expected


def test_bucket_by_token_budget_null_count_folds_as_zero(spark):
    """One NULL token count must not poison the fold: NULL acc would make
    `overflow` NULL on every later chunk, packing the rest of the doc into
    one unbounded group."""
    sizes = [400, None, 400, 300, 900]
    df = spark.createDataFrame(
        [(1, i, f"c{i}", s) for i, s in enumerate(sizes)],
        "doc_id long, chunk_idx long, text string, n_tokens int",
    )
    rows = bucket_by_token_budget(df, 1000).orderBy("chunk_idx").collect()
    # NULL folds as 0: [400,0,400]=800, +300 -> 1100 new group, [300,900] -> 900 new
    assert [r.group_id for r in rows] == [0, 0, 0, 1, 2]


def test_collapse_passes_through_doc_with_all_null_counts(spark):
    """A doc whose every row has a NULL token count must survive the loop
    (total coalesces to 0 = fits), not vanish by failing both the >budget
    and <=budget filters."""
    df = spark.createDataFrame(
        [(1, 0, None, None), (2, 0, "w " * 40, 40)],
        "doc_id long, chunk_idx long, text string, n_tokens int",
    )
    out = collapse_until_fits(df, MockSummarizer(max_tokens=50), token_max=500)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_collapse_honors_custom_tokens_col(spark):
    """tokens_col != 'n_tokens' must survive a reduce round (reduce_groups
    stamps 'n_tokens'; the loop re-aliases it)."""
    df = spark.createDataFrame(
        [(1, i, ("w%d " % i) * 200, 200) for i in range(10)],
        "doc_id long, chunk_idx long, text string, tok_count int",
    )
    out = collapse_until_fits(
        df, MockSummarizer(max_tokens=50), token_max=500, tokens_col="tok_count"
    )
    assert out.columns == ["doc_id", "chunk_idx", "text", "tok_count"]
    total = out.groupBy("doc_id").agg(F.sum("tok_count").alias("t")).first()["t"]
    assert total <= 500


def test_collapse_releases_checkpoints_when_summarizer_fails(spark):
    """A summarizer that dies mid-loop must not pin the superseded round's
    localCheckpoint for the session (clearCache cannot free those)."""
    import pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        persistent_rdd_ids,
    )

    class ExplodingSummarizer(MockSummarizer):
        def summarize_df(self, df, in_col, out_col):
            raise RuntimeError("model down")

    df = spark.createDataFrame(
        [(1, i, ("w%d " % i) * 200, 200) for i in range(10)],
        "doc_id long, chunk_idx long, text string, n_tokens int",
    )
    before = persistent_rdd_ids(spark.sparkContext)
    with pytest.raises(RuntimeError, match="model down"):
        collapse_until_fits(df, ExplodingSummarizer(max_tokens=50), token_max=500)
    assert persistent_rdd_ids(spark.sparkContext) - before == set()


def test_bucket_running_sum_assigns_by_offset(spark):
    sizes = [400, 400, 300, 900]
    df = spark.createDataFrame(
        [(1, i, f"c{i}", s) for i, s in enumerate(sizes)],
        ["doc_id", "chunk_idx", "text", "n_tokens"],
    )
    rows = bucket_running_sum(df, 1000).orderBy("chunk_idx").collect()
    # offsets 0,400,800,1100 -> groups 0,0,0,1
    assert [r.group_id for r in rows] == [0, 0, 0, 1]


def test_collapse_until_fits_converges(spark):
    # 20 chunks x 200 tokens = 4000 tokens, token_max 500, mock emits 50 tokens
    df = spark.createDataFrame(
        [(1, i, ("w%d " % i) * 200, 200) for i in range(20)],
        ["doc_id", "chunk_idx", "text", "n_tokens"],
    )
    out = collapse_until_fits(df, MockSummarizer(max_tokens=50), token_max=500)
    totals = out.groupBy("doc_id").agg(F.sum("n_tokens").alias("t")).first()
    assert totals["t"] <= 500
    assert out.count() >= 1


def test_recursive_split_overlap_never_overflows_budget():
    """Retained overlap + incoming piece must respect chunk_size (langchain
    _merge_splits parity): before the shed loop, 70-token sentences with an
    80-token overlap produced 140-token chunks — a 40% context-window
    overflow at production sizes."""
    text = ". ".join(" ".join(f"w{i}_{j}" for j in range(70)) for i in range(4))
    chunks = recursive_split_text(text, chunk_size=100, chunk_overlap=80)
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.chunking import (
        ws_len,
    )

    assert all(ws_len(c) <= 100 for c in chunks), [ws_len(c) for c in chunks]


def test_chunk_fixed_tokens_null_text_like_empty(spark):
    """NULL text emits one ('', 0) row like empty text — not a
    (chunk NULL, n_tokens -1) row whose -1 (size(NULL) under ANSI-off)
    poisons every downstream token aggregate."""
    docs = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    rows = {r.doc_id: r for r in chunk_fixed_tokens(docs, 10).collect()}
    assert (rows[1].chunk, rows[1].n_tokens) == ("", 0)
    assert rows[2].n_tokens == 3
