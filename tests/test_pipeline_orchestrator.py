import os

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.pipeline import (
    run_evaluation_pipeline,
)


def _corpus(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(300))) for i in range(6)],
        ["doc_id", "text"],
    )
    refs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(5)],  # doc 5 has no ref
        ["doc_id", "reference"],
    )
    return docs, refs


def test_sweep_shapes_and_best_model(spark):
    docs, refs = _corpus(spark)
    res = run_evaluation_pipeline(
        docs,
        refs,
        summarizers={"mock_small": MockSummarizer(20), "mock_big": MockSummarizer(45)},
        approaches=["truncated", "mapreduce"],
        config={"mapreduce": {"chunk_size": 100, "chunk_overlap": 0, "token_max": 120}},
    )
    assert res.summaries.count() == 6 * 2 * 2  # docs x approaches x models
    assert res.metrics.count() == 5 * 2 * 2  # only paired docs evaluated
    stats = {(r.approach, r.model): r for r in res.statistics.collect()}
    assert len(stats) == 4 and all(r.n == 5 for r in stats.values())
    best = {r.approach: r.best_model for r in res.best_models.collect()}
    # 45-token mock summaries overlap the 40-token references more
    assert best["truncated"] == "mock_big"
    assert set(res.manifest["cells"]) == {
        "truncated/mock_small", "truncated/mock_big",
        "mapreduce/mock_small", "mapreduce/mock_big",
    }


def test_sweep_incremental_skip(spark, tmp_path):
    docs, refs = _corpus(spark)
    out = str(tmp_path / "sweep")
    kw = dict(
        summarizers={"m": MockSummarizer(20)},
        approaches=["truncated"],
        out_dir=out,
    )
    first = run_evaluation_pipeline(docs, refs, **kw)
    assert first.manifest["cells"]["truncated/m"]["new_docs"] == 6
    assert os.path.exists(os.path.join(out, "manifest.json"))
    second = run_evaluation_pipeline(docs, refs, **kw)
    assert second.manifest["cells"]["truncated/m"]["new_docs"] == 0  # all skipped
    assert second.summaries.count() == 6  # prior results still served
