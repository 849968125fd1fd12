import math

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.judge import (
    MockJudge,
    judge_case_tallies,
    llm_judge_scores,
)


def test_llm_judge_scores_and_error_column(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat", "the cat sat on the mat"),
            (2, "__FAIL__ broken case", "reference text"),
            (3, "unrelated words entirely", "the cat sat"),
        ],
        ["doc_id", "summary", "reference"],
    )
    scored = llm_judge_scores(df, MockJudge()).orderBy("doc_id").collect()
    assert scored[0].status == "ok"
    assert math.isclose(scored[0].llm_correctness, 3 / 5)  # 3 of 5 distinct ref tokens hit
    assert scored[1].status == "failed"
    assert scored[1].llm_correctness is None  # error column, task survived
    assert scored[2].status == "ok" and scored[2].llm_correctness == 0.0


def test_judge_case_tallies(spark):
    df = spark.createDataFrame(
        [
            (1, "a b", "a b"),
            (2, "__FAIL__", "x"),
            (3, "__FAIL__", "y"),
        ],
        ["doc_id", "summary", "reference"],
    )
    t = judge_case_tallies(llm_judge_scores(df, MockJudge())).first()
    assert (t.n_ok, t.n_failed) == (1, 2)
    assert math.isclose(t.correctness_mean, 1.0)  # failures excluded from means
