"""repetition_stats: known-answer checks for the Gopher-style repetition
filters (dup-token / dup-bigram / top-token ratios)."""

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
    repetition_stats,
)


def _stats(spark, text):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(repetition_stats("text").alias("r"))
        .first()["r"]
    )
    return row["dup_token_ratio"], row["dup_bigram_ratio"], row["top_token_ratio"]


def test_all_unique_tokens(spark):
    dup, dbg, top = _stats(spark, "a b c d")
    assert dup == 0.0
    assert dbg == 0.0  # bigrams: "a b","b c","c d" all distinct
    assert top == pytest.approx(0.25)


def test_fully_repeated_token(spark):
    dup, dbg, top = _stats(spark, "x x x x")
    assert dup == pytest.approx(0.75)  # 1 distinct of 4
    assert dbg == pytest.approx(2 / 3)  # "x x" once distinct of 3
    assert top == pytest.approx(1.0)


def test_case_folding_counts_as_duplicate(spark):
    dup, _, top = _stats(spark, "The the THE cat")
    assert dup == pytest.approx(0.5)  # {the, cat} of 4
    assert top == pytest.approx(0.75)


def test_empty_and_null_yield_zeros(spark):
    df = spark.createDataFrame([("",), (None,), ("   ",)], "text string")
    rows = df.select(repetition_stats("text").alias("r")).collect()
    for r in rows:
        assert r["r"]["dup_token_ratio"] == 0.0
        assert r["r"]["dup_bigram_ratio"] == 0.0
        assert r["r"]["top_token_ratio"] == 0.0


def test_single_token_has_no_bigrams(spark):
    dup, dbg, top = _stats(spark, "solo")
    assert (dup, dbg, top) == (0.0, 0.0, 1.0)


def test_batch_path_matches_column_path(spark, sf_dir):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
        repetition_stats_batch,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    col = {
        r["doc_id"]: (
            round(r["r"]["dup_token_ratio"], 9),
            round(r["r"]["dup_bigram_ratio"], 9),
            round(r["r"]["top_token_ratio"], 9),
        )
        for r in docs.select("doc_id", repetition_stats("text").alias("r")).collect()
    }
    batch = {
        r["doc_id"]: (
            round(r["dup_token_ratio"], 9),
            round(r["dup_bigram_ratio"], 9),
            round(r["top_token_ratio"], 9),
        )
        for r in repetition_stats_batch(docs).collect()
    }
    assert col == batch
