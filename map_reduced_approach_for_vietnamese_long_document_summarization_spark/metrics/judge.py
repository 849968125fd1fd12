"""LLM-judge metrics (SURVEY §2.9 M4: G-Eval correctness/coherence,
evaluate/evaluate_summaries_semantic.py:203-433).

The reference calls OpenRouter per case inside try/except, counts
successful/failed cases (A7), and skips failures. Engine shape: a pluggable
``Judge`` evaluated inside an Arrow-batched pandas UDF; failures become an
error *column* (status='failed', null scores) — never task failures — so one
bad case can't kill a stage, matching the reference's per-case skip
semantics. Scores are 0-1 floats like the reference's normalized G-Eval
output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Judge:
    """Score one (generated, reference) case -> (correctness, coherence).

    Raise to signal a failed case; the runner records it as status='failed'.
    """

    def __call__(self, generated: str, reference: str) -> tuple[float, float]:  # pragma: no cover
        raise NotImplementedError


class MockJudge(Judge):
    """Deterministic judge: correctness = distinct-unigram overlap ratio,
    coherence = bounded length ratio; raises on every case whose generated
    text contains '__FAIL__' so the failure path is exercised in tests."""

    def __call__(self, generated: str, reference: str) -> tuple[float, float]:
        if "__FAIL__" in (generated or ""):
            raise RuntimeError("mock judge failure")
        g = set((generated or "").split())
        r = set((reference or "").split())
        correctness = len(g & r) / len(r) if r else 0.0
        lg = len((generated or "").split())
        coherence = min(1.0, lg / 100.0)
        return correctness, coherence


# The reference defines two named G-Eval metrics (evaluate_summaries_
# semantic.py:274-307): "Summary Correctness" judges the generated summary
# AGAINST the reference (ACTUAL_OUTPUT + EXPECTED_OUTPUT params), "Summary
# Coherence" judges the generated text ALONE (ACTUAL_OUTPUT only). Criteria
# below mirror that rubric pair.
CORRECTNESS_RUBRIC = (
    "Summary Correctness (1-5): how accurately the generated summary captures "
    "the key information and main points of the reference summary — amount of "
    "correct information relative to the reference, absence of contradictions "
    "with the source, and coverage of key points, themes, and events."
)
COHERENCE_RUBRIC = (
    "Summary Coherence (1-5): logical flow, structure, and organization of the "
    "generated summary — clear sentence-to-sentence progression, consistent "
    "style and tone, appropriate transitions, a cohesive narrative rather than "
    "a collection of disconnected facts."
)


class OpenAICompatibleJudge(Judge):
    """HTTP judge against any OpenAI-compatible /chat/completions endpoint
    (the reference's OpenRouterModel, evaluate_summaries_semantic.py:38-122).

    Faithful to the reference's G-Eval setup: one call per named metric —
    correctness sees generated + reference, coherence sees the generated
    text only (EVAL:283-307). Exercised against an in-thread fake server in
    tests/test_http_clients.py; live network services are not assumed in CI.
    """

    def __init__(self, base_url: str, api_key: str, model: str, timeout: float = 60.0):
        self.base_url = base_url
        self.api_key = api_key
        self.model = model
        self.timeout = timeout

    def _score(self, rubric: str, sections: list[tuple[str, str]]) -> float:
        import json as _json
        import urllib.request

        parts = [rubric, 'Answer as JSON {"score": x} with x in 1-5.']
        parts += [f"{label}:\n{text}" for label, text in sections]
        body = _json.dumps(
            {
                "model": self.model,
                "messages": [{"role": "user", "content": "\n\n".join(parts)}],
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.base_url}/chat/completions",
            data=body,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as raw:
            resp = _json.loads(raw.read())
        score = float(_json.loads(resp["choices"][0]["message"]["content"])["score"])
        if not 1.0 <= score <= 5.0:
            # out-of-range replies (score 0, 10, ...) are a judge failure,
            # not a datum: raising routes the case to status='failed'
            # instead of normalizing to a negative or >1 "valid" score
            raise ValueError(f"judge returned out-of-range score {score!r}")
        # normalize 1-5 -> 0-1 like the reference's G-Eval output
        return (score - 1) / 4

    def __call__(self, generated: str, reference: str) -> tuple[float, float]:
        correctness = self._score(
            CORRECTNESS_RUBRIC,
            [("SUMMARY", generated), ("REFERENCE", reference)],
        )
        coherence = self._score(COHERENCE_RUBRIC, [("SUMMARY", generated)])
        return correctness, coherence


_JUDGE_SCHEMA = T.StructType(
    [
        T.StructField("llm_correctness", T.DoubleType()),
        T.StructField("llm_coherence", T.DoubleType()),
        T.StructField("status", T.StringType()),
    ]
)


def llm_judge_scores(
    df: DataFrame,
    judge: Judge,
    gen_col: str = "summary",
    ref_col: str = "reference",
) -> DataFrame:
    """Add (llm_correctness, llm_coherence, status) per row; failed cases get
    nulls + status='failed' (error-column pattern)."""
    clash = {"_j", "llm_correctness", "llm_coherence", "status"} & set(df.columns)
    if clash:
        raise ValueError(
            f"llm_judge_scores reserves output columns {sorted(clash)}; "
            "rename them first (a pre-existing one would come back "
            "duplicated and break every downstream reference to it)"
        )

    @F.pandas_udf(_JUDGE_SCHEMA)
    def judge_udf(gen: pd.Series, ref: pd.Series) -> pd.DataFrame:
        rows = []
        for g, r in zip(gen, ref):
            try:
                c, h = judge(g, r)
                rows.append((c, h, "ok"))
            except Exception:
                rows.append((None, None, "failed"))
        return pd.DataFrame(rows, columns=["llm_correctness", "llm_coherence", "status"])

    scored = df.withColumn("_j", judge_udf(F.col(gen_col), F.col(ref_col)))
    return scored.select(
        "*",
        F.col("_j.llm_correctness").alias("llm_correctness"),
        F.col("_j.llm_coherence").alias("llm_coherence"),
        F.col("_j.status").alias("status"),
    ).drop("_j")


def judge_case_tallies(scored: DataFrame, group_cols: list[str] = []) -> DataFrame:
    """Success/failure case counts (A7, evaluate_summaries_semantic.py
    :369-382) + mean scores over successful cases."""
    aggs = [
        F.count(F.when(F.col("status") == "ok", 1)).alias("n_ok"),
        F.count(F.when(F.col("status") == "failed", 1)).alias("n_failed"),
        F.avg("llm_correctness").alias("correctness_mean"),
        F.avg("llm_coherence").alias("coherence_mean"),
    ]
    if group_cols:
        return scored.groupBy(*group_cols).agg(*aggs)
    return scored.agg(*aggs)
