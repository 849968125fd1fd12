import json

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.text import (
    hf_token_count_udf,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.demo import (
    compare_approaches,
    summarize_document,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.hierarchical import (
    flatten_tree_json,
    read_tree_json,
)


def test_summarize_document_all_approaches(spark):
    text = " ".join(f"tok{i}" for i in range(2500))
    out = summarize_document(
        spark, text, MockSummarizer(32), reference=" ".join(f"tok{i}" for i in range(40))
    )
    assert set(out) == {"truncated", "mapreduce", "iterative", "mapreduce_critique"}
    for cell in out.values():
        assert cell["summary"]
        assert 0.0 <= cell["rouge1_f"] <= 1.0


def test_compare_approaches_five_tabs(spark):
    text = " ".join(f"tok{i}" for i in range(300))
    tree = json.dumps(
        {
            "type": "Document",
            "text": "t1",
            "children": [{"type": "Paragraph", "text": text}],
        }
    )
    ref = " ".join(f"tok{i}" for i in range(40))
    df = compare_approaches(spark, text, MockSummarizer(16), reference=ref, tree_json=tree)
    rows = {r.approach: r for r in df.collect()}
    # all five demo tabs, tabulated with the demo's metric columns
    assert set(rows) == {
        "truncated", "mapreduce", "iterative", "mapreduce_critique", "mapreduce_hierarchical",
    }
    assert df.columns == ["approach", "summary", "rouge1_f", "rouge2_f", "rougeL_f"]
    for r in rows.values():
        assert r.summary
        assert 0.0 <= r.rouge1_f <= 1.0

    # missing-tree branch mirrors the demo's placeholder
    out = summarize_document(
        spark, text, MockSummarizer(16), approaches=["mapreduce_hierarchical"]
    )
    assert out["mapreduce_hierarchical"]["summary"] == "(No tree file found)"


def test_read_tree_json_source(spark, tmp_path):
    tree = {
        "type": "Document",
        "text": "t1",
        "children": [{"type": "Paragraph", "text": "body text"}],
    }
    d = tmp_path / "trees"
    d.mkdir()
    (d / "t1.json").write_text(json.dumps(tree))
    trees = read_tree_json(spark, str(d))
    nodes = flatten_tree_json(trees).orderBy("node_id").collect()
    assert [n.node_type for n in nodes] == ["Document", "Paragraph"]
    assert nodes[0].doc_id == "t1"


def test_split_root_tree_and_doc_pairing(spark):
    import json as _json

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.hierarchical import (
        pair_docs_with_trees,
        split_root_tree,
    )

    root = {
        "type": "Root",
        "text": "",
        "children": [
            {"type": "Document", "text": "doc_a",
             "children": [{"type": "Paragraph", "text": "body a"}]},
            {"type": "Document", "text": "doc_b",
             "children": [{"type": "Paragraph", "text": "body b"}]},
            {"type": "Header", "text": "stray non-document node"},
        ],
    }
    trees = spark.createDataFrame([(json.dumps(root),)], ["tree_json"])
    per_doc = split_root_tree(trees)
    rows = {r.doc_id: _json.loads(r.tree_json) for r in per_doc.collect()}
    assert set(rows) == {"doc_a", "doc_b"}  # stray Header ignored
    assert rows["doc_a"]["children"][0]["text"] == "body a"

    docs = spark.createDataFrame(
        [("doc_a", "text a"), ("doc_c", "no tree for me")], ["doc_id", "text"]
    )
    matched, missing = pair_docs_with_trees(docs, per_doc)
    assert [r.doc_id for r in matched.collect()] == ["doc_a"]
    assert [r.doc_id for r in missing.collect()] == ["doc_c"]  # skip-report side


def test_hf_token_count_gated():
    # transformers is not installed in this runtime -> the strict gate must
    # signal unavailability rather than raise, and the default must fall
    # back to the vendored BPE-ish counter (a live pandas UDF)
    assert hf_token_count_udf(fallback="none") is None
    assert hf_token_count_udf() is not None


def test_tree_fixture_node_counts_per_level(spark, sf_dir):
    """A6 golden counts for the document_tree.json fixture path: every doc
    flattens to exactly 1 Document (d0) + 2 Header (d1) + 2 Paragraph (d2)
    nodes in DFS-preorder, whatever the corpus size."""
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans.relational import (
        build_tree_fixture,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.hierarchical import (
        split_root_tree,
    )

    fixture = build_tree_fixture(spark, sf_dir)
    trees = read_tree_json(spark, fixture)
    per_doc = split_root_tree(trees.select("tree_json"))
    nodes = flatten_tree_json(per_doc)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    by_depth = {
        (r.depth, r.node_type): r.c
        for r in nodes.groupBy("depth", "node_type").agg(F.count("*").alias("c")).collect()
    }
    assert by_depth == {
        (0, "Document"): n_docs,
        (1, "Header"): 2 * n_docs,
        (2, "Paragraph"): 2 * n_docs,
    }
    # DFS-preorder ids: per doc exactly nodes 0..4; paragraph paths run
    # root -> header (closure encoding for the explode+join gather)
    shape = nodes.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("node_id").alias("mx")
    )
    bad = shape.filter((F.col("n") != 5) | (F.col("mx") != 4))
    assert bad.isEmpty()
    p = nodes.filter(F.col("node_type") == "Paragraph").select("path", "parent_id")
    assert p.filter(
        (F.size("path") != 2) | (F.element_at("path", 1) != 0)
        | (F.element_at("path", 2) != F.col("parent_id"))
    ).isEmpty()
