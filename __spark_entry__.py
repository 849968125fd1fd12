"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query: the reference's headline map-reduce
summarization pipeline (chunk -> map -> recursive collapse -> final reduce),
run with the deterministic mock summarizer over the sf0.001 documents corpus,
joined with per-doc corpus statistics.

``queries()`` / ``oracle_sql()`` — the operator inventory from SURVEY §2
mapped onto the harness tables; registry lives in
``map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# make the sibling package importable regardless of the driver's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
        ws_token_count,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
        load_table,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
        mapreduce_summarize,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    summaries = mapreduce_summarize(
        docs.select("doc_id", "text"),
        MockSummarizer(max_tokens=24),
        chunk_size=60,
        chunk_overlap=10,
        token_max=80,
    )
    stats = docs.select(
        "doc_id", "lang", ws_token_count("text").alias("doc_tokens")
    )
    return summaries.join(stats, "doc_id").select(
        "doc_id",
        "lang",
        "doc_tokens",
        ws_token_count("summary").alias("summary_tokens"),
        "summary",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (plus north-star
    extensions); each callable takes (spark, sf_dir) -> DataFrame."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; entries whose
    semantics are driver-side iteration or per-group folds (collapse loop,
    iterative refinement) are intentionally rows-only."""
    return dict(ORACLES)
