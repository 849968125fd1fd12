"""End-to-end example: the reference's full evaluation pipeline (EP1) on the
harness corpus with the deterministic mock summarizer.

    python examples/run_sweep.py [sf_dir] [out_dir]

Swap MockSummarizer for OllamaSummarizer(model=...) against a live Ollama
server to run the real thing — every other line stays the same.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
    truncate_tokens,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.pipeline import (
    run_evaluation_pipeline,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None

    spark = get_spark(app_name="vlds-example-sweep")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # harness corpus ships no gold summaries; stand in with leading-token
    # extracts so the metric stage has a reference column
    refs = docs.select("doc_id", truncate_tokens("text", 40).alias("reference"))

    res = run_evaluation_pipeline(
        docs,
        refs,
        summarizers={
            "mock-32": MockSummarizer(32),
            "mock-64": MockSummarizer(64),
        },
        approaches=["truncated", "mapreduce", "iterative"],
        config={"mapreduce": {"chunk_size": 60, "chunk_overlap": 10, "token_max": 80}},
        out_dir=out_dir,
    )

    print("\n=== per-(approach, model) statistics ===")
    res.statistics.orderBy("approach", "model").show(truncate=False)
    print("=== best model per approach (rouge1 mean) ===")
    res.best_models.orderBy("approach").show(truncate=False)
    print("=== manifest ===")
    import json

    print(json.dumps(res.manifest, indent=2, default=str))


if __name__ == "__main__":
    main()
