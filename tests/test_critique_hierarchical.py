import json

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockCritic,
    MockSummarizer,
    flatten_tree_json,
    hierarchical_summarize,
    mapreduce_critique_summarize,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.critique import (
    _reduce_with_critique,
)


def test_reduce_with_critique_branches():
    s = MockSummarizer(5)  # 5 tokens -> odd -> critic flags
    c = MockCritic()
    out = _reduce_with_critique(["one two three four five six"], ["orig"], s, c, 0, 2)
    assert out.startswith("[refined] ")
    s2 = MockSummarizer(4)  # even token count -> "no issues" -> unrefined
    out2 = _reduce_with_critique(["one two three four five six"], ["orig"], s2, c, 0, 2)
    assert not out2.startswith("[refined] ")
    # iteration cap skips critique entirely
    out3 = _reduce_with_critique(["one two three four five six"], ["orig"], s, c, 2, 2)
    assert not out3.startswith("[refined] ")


def test_section_tagging_feeds_reduce():
    s = MockSummarizer(3)
    c = MockCritic()
    out = _reduce_with_critique(["alpha", "beta"], ["o1", "o2"], s, c, 5, 2)
    # tagged input is "[PHẦN 1]\nalpha\n\n[PHẦN 2]\nbeta"; mock keeps first 3 tokens
    assert out.split() == ["[PHẦN", "1]", "alpha"]


def test_mapreduce_critique_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(600))), (2, "tiny doc")],
        ["doc_id", "text"],
    )
    out = mapreduce_critique_summarize(
        docs,
        MockSummarizer(21),  # odd -> critique branch fires
        MockCritic(),
        chunk_size=100,
        chunk_overlap=0,
        token_max=60,
        max_critique_iterations=2,
    )
    rows = {r.doc_id: r.summary for r in out.collect()}
    assert set(rows) == {1, 2}
    assert all(len(v) > 0 for v in rows.values())
    # refined outputs from flagged groups survive into the final summary
    # (mock summarizer echoes tags/markers; a real LLM would not)
    assert "[refined]" in rows[1]


def _tree(doc_id: str):
    return {
        "type": "Document",
        "text": doc_id,
        "children": [
            {
                "type": "Header",
                "text": "Section A",
                "children": [
                    {"type": "Paragraph", "text": "alpha one two three"},
                    {"type": "Paragraph", "text": "beta four five six"},
                ],
            },
            {
                "type": "Header",
                "text": "Empty Section",
                "children": [],  # empty-body guard (HI:255-257)
            },
            {"type": "Paragraph", "text": "loose paragraph text"},
        ],
    }


def test_flatten_tree_json(spark):
    trees = spark.createDataFrame(
        [("d1", json.dumps(_tree("d1")))], ["doc_id", "tree_json"]
    )
    nodes = flatten_tree_json(trees).orderBy("node_id").collect()
    assert [n.node_type for n in nodes] == [
        "Document", "Header", "Paragraph", "Paragraph", "Header", "Paragraph",
    ]
    assert [n.depth for n in nodes] == [0, 1, 2, 2, 1, 1]
    assert nodes[2].path == [0, 1]  # paragraph under header under document
    assert nodes[1].parent_id == 0


def test_hierarchical_max_depth_cap(spark):
    """max_depth caps collapse at min(max_depth, actual) (HI:289-290): with
    max_depth=1 only level-1 headers collapse, but their summaries must
    still cover descendant paragraphs from deeper levels (D14 gathers the
    whole subtree)."""
    deep = {
        "type": "Document",
        "text": "d",
        "children": [
            {
                "type": "Header",
                "text": "H1",
                "children": [
                    {
                        "type": "Header",
                        "text": "H2-nested",
                        "children": [
                            {"type": "Paragraph", "text": "deep paragraph content"},
                        ],
                    },
                ],
            },
        ],
    }
    trees = spark.createDataFrame([("d", json.dumps(deep))], ["doc_id", "tree_json"])
    out = hierarchical_summarize(
        trees, MockSummarizer(64), max_depth=1, chunk_size=100, chunk_overlap=0,
        token_max=80, polish=False,
    ).first()
    # level-1 header collapsed with ALL descendant paragraphs gathered;
    # the nested header title itself is not a paragraph so only the body text
    # must appear
    assert "H1:" in out.summary
    assert "deep paragraph content" in out.summary


def test_collapse_mixed_convergence(spark):
    """Docs leave the collapse loop as soon as they fit: the small doc's rows
    must pass through unchanged while the big doc collapses."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.collapse import (
        collapse_until_fits,
    )
    from pyspark.sql import functions as F

    rows = [(1, i, f"big{i} " * 100, 100) for i in range(10)]  # 1000 > 200
    rows += [(2, 0, "small doc text", 3)]  # already fits
    df = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "text", "n_tokens"])
    stats: dict = {}
    out = collapse_until_fits(df, MockSummarizer(40), token_max=200, stats=stats)
    small = out.filter("doc_id = 2").collect()
    assert [(r.chunk_idx, r.text) for r in small] == [(0, "small doc text")]
    big_total = out.filter("doc_id = 1").agg(F.sum("n_tokens")).first()[0]
    assert big_total <= 200 and stats["rounds"] >= 1


def test_hierarchical_summarize_end_to_end(spark):
    trees = spark.createDataFrame(
        [("d1", json.dumps(_tree("d1"))), ("d2", json.dumps(_tree("d2")))],
        ["doc_id", "tree_json"],
    )
    out = hierarchical_summarize(
        trees, MockSummarizer(50), max_depth=2, chunk_size=100, chunk_overlap=0,
        token_max=80,
    )
    rows = {r.doc_id: r.summary for r in out.collect()}
    assert set(rows) == {"d1", "d2"}
    # section title survives as "Section A:\n..." prefix (HI:270-272)
    assert "Section A:" in rows["d1"]
    # empty section keeps its bare title
    assert "Empty Section" in rows["d1"]
    assert "loose paragraph text" in rows["d1"]


def test_hierarchical_emits_row_for_paragraphless_tree(spark):
    """A tree with no Paragraph node must still yield one (doc_id, summary)
    row (empty summary), like every other approach — it previously vanished
    from the output entirely."""
    import json

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.hierarchical import (
        hierarchical_summarize,
    )

    trees = spark.createDataFrame(
        [
            ("empty", json.dumps({"type": "Root", "children": []})),
            (
                "real",
                json.dumps(
                    {
                        "type": "Root",
                        "children": [{"type": "Paragraph", "text": "alpha beta"}],
                    }
                ),
            ),
        ],
        ["doc_id", "tree_json"],
    )
    rows = {r.doc_id: r.summary for r in hierarchical_summarize(trees, MockSummarizer(8)).collect()}
    assert set(rows) == {"empty", "real"}
    assert rows["empty"] == ""
    assert "alpha" in rows["real"]


def test_flatten_tree_deep_and_malformed(spark):
    """The walk is stack-based, so tree depth is bounded only by
    json.loads' own recursive parser (~490 at the default limit) — a
    400-deep tree flattens with correct preorder ids; a non-dict child
    raises a clear error naming the doc instead of an opaque
    AttributeError mid-task."""
    import json

    import pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.hierarchical import (
        flatten_tree_json,
    )

    d = 400
    deep_json = (
        '{"type":"Header","text":"","children":[' * d
        + '{"type":"Paragraph","text":"leaf"}'
        + "]}" * d
    )
    deep = spark.createDataFrame([("d", deep_json)], ["doc_id", "tree_json"])
    nodes = flatten_tree_json(deep).collect()
    assert len(nodes) == d + 1
    # preorder: node_id == depth on a pure chain
    assert {(r.node_id, r.depth) for r in nodes} == {(i, i) for i in range(d + 1)}

    bad = spark.createDataFrame(
        [("b", json.dumps({"type": "Root", "children": ["stray"]}))],
        ["doc_id", "tree_json"],
    )
    with pytest.raises(Exception, match="malformed tree"):
        flatten_tree_json(bad).count()
