import json
import os

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.utilities import (
    clean_summaries_job,
    corpus_token_stats,
)


def test_corpus_token_stats_with_json_sink(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "")], ["doc_id", "text"]
    )
    out = str(tmp_path / "meta")
    rows, totals = corpus_token_stats(docs, out_json=out)
    got = {r.doc_id: r.tokens for r in rows.collect()}
    assert got == {1: 3, 2: 2, 3: 0}
    assert totals == {
        "n_docs": 3,
        "total_tokens": 5,
        "avg_tokens": 5 / 3,
        "total_characters": 8,  # "a b c"(5) + "d e"(3) + ""(0)
    }
    back = spark.read.json(out)
    assert back.count() == 3
    with open(os.path.join(out, "_totals.json")) as f:
        assert json.load(f)["total_tokens"] == 5


def test_clean_summaries_job(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    (src / "s1.txt").write_text("<think>x\ny</think>Real summary one.")
    (src / "s2.txt").write_text("No tags here.")
    out = str(tmp_path / "cleaned")
    cleaned = clean_summaries_job(spark, str(src), out)
    got = {r.doc_id: r.summary for r in cleaned.collect()}
    assert got == {"s1": "Real summary one.", "s2": "No tags here."}
    assert os.path.isdir(os.path.join(out, "doc_id=s1"))
