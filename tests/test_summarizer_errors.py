import pandas as pd

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    OllamaSummarizer,
)


def test_ollama_summarizer_error_column_semantics():
    # unreachable server: every row yields an __ERROR__-prefixed string
    # (error column), never an exception that would kill a Spark task
    s = OllamaSummarizer(base_url="http://127.0.0.1:1", timeout=0.5)
    out = s(pd.Series(["some text", "other text"]))
    assert len(out) == 2
    assert all(str(v).startswith("__ERROR__") for v in out)


def test_ollama_summarizer_spark_integration(spark):
    # the same path through summarize_df: rows survive with error markers
    s = OllamaSummarizer(base_url="http://127.0.0.1:1", timeout=0.5)
    df = spark.createDataFrame([(1, "text")], ["doc_id", "text"])
    row = s.summarize_df(df, "text", "summary").first()
    assert row.summary.startswith("__ERROR__")
