"""Pluggable summarizer (SURVEY §2.1 S9, §2.4 D2).

The reference's 'map' operator is an HTTP POST to a local Ollama server per
chunk (runners/run_summarization_ollama_mapreduce.py:37-49); its tests don't
exist, and its fan-out is fake-parallel (SURVEY §4). Here the summarizer is
an interface with two execution paths:

* ``expr()`` — a Catalyst Column expression. When available (the
  deterministic mock), the entire map stage stays JVM-side in whole-stage
  codegen: zero Python cost, which is what makes the engine benchmarkable at
  sf0.1 and viable at 100 TB.
* ``__call__`` — an Arrow-batched pandas function. The HTTP-LLM summarizer
  uses this path with a per-executor lazy client (module-level init, the
  standard pandas-UDF resource pattern). The stdlib client carries no
  connection pool — one TCP connection per call, closed promptly; the
  ``_http_session`` seam is where a deployment swaps in a pooled client so
  1000 executors each keep one pool, not one connection per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import truncate_tokens


class Summarizer:
    """Base: subclasses override ``expr`` (JVM fast path) or ``__call__``."""

    def expr(self, col: Column) -> Column | None:  # pragma: no cover - interface
        return None

    def __call__(self, texts: pd.Series) -> pd.Series:  # pragma: no cover
        raise NotImplementedError

    def summarize_df(self, df: DataFrame, in_col: str, out_col: str) -> DataFrame:
        """Apply to a column, choosing the JVM path when the summarizer
        exposes one, else an Arrow-batched pandas UDF."""
        e = self.expr(F.col(in_col))
        if e is not None:
            return df.withColumn(out_col, e)
        fn = self

        @F.pandas_udf(T.StringType())
        def _udf(s: pd.Series) -> pd.Series:
            return fn(s)

        return df.withColumn(out_col, _udf(F.col(in_col)))

    # Python-side twin used by inherently sequential operators (the iterative
    # fold runs inside applyInPandas where Column expressions don't exist).
    def summarize_text(self, text: str) -> str:
        return self(pd.Series([text])).iloc[0]


class MockSummarizer(Summarizer):
    """Deterministic extractive mock: first ``max_tokens`` whitespace tokens
    (FIXTURES.md §7). Makes chunk counts, collapse rounds, and fold order
    assertable without a model — and runs fully JVM-side."""

    def __init__(self, max_tokens: int = 64):
        self.max_tokens = max_tokens

    def expr(self, col: Column) -> Column:
        return truncate_tokens(col, self.max_tokens)

    def __call__(self, texts: pd.Series) -> pd.Series:
        k = self.max_tokens
        return texts.map(lambda t: " ".join((t or "").split()[:k]))


_SESSION = None  # per-executor lazy HTTP client (module import cached once)


def _http_session():
    """Per-executor HTTP client. stdlib ``urllib.request`` — honest caveat:
    it opens one TCP connection PER CALL (no keep-alive pooling); the lazy
    global only caches the module import. Good enough for the mock/demo
    paths exercised here; a production deployment pointing thousands of
    executors at one LLM endpoint should swap in a pooled client
    (``requests.Session`` / httpx) at this seam — it is the only place the
    client is resolved."""
    global _SESSION
    if _SESSION is None:
        import urllib.request

        _SESSION = urllib.request  # stdlib fallback; requests not assumed
    return _SESSION


class OllamaSummarizer(Summarizer):
    """HTTP-LLM summarizer mirroring the reference's ``POST /api/generate``
    (runners/run_summarization_ollama_mapreduce.py:37-49). Network services
    are not assumed in CI — constructing it is cheap, calling it requires a
    reachable server. Errors surface as an error-prefixed string per row
    (error-column pattern) rather than task failures, so one bad row doesn't
    kill a 100 TB stage."""

    def __init__(
        self,
        base_url: str = "http://localhost:11434",
        model: str = "llama3.2:3b",
        prompt_template: str = "Write a concise summary of the following text:\n\n{text}",
        max_new_tokens: int = 512,
        timeout: float = 120.0,
    ):
        self.base_url = base_url
        self.model = model
        self.prompt_template = prompt_template
        self.max_new_tokens = max_new_tokens
        self.timeout = timeout

    def __call__(self, texts: pd.Series) -> pd.Series:
        import json as _json

        req = _http_session()
        out = []
        for t in texts:
            try:
                body = _json.dumps(
                    {
                        "model": self.model,
                        "prompt": self.prompt_template.format(text=t or ""),
                        "stream": False,
                        "options": {"num_predict": self.max_new_tokens},
                    }
                ).encode()
                with req.urlopen(
                    req.Request(
                        f"{self.base_url}/api/generate",
                        data=body,
                        headers={"Content-Type": "application/json"},
                    ),
                    timeout=self.timeout,
                ) as r:  # close the socket promptly, not at GC
                    out.append(_json.loads(r.read())["response"])
            except Exception as e:  # error column, not task failure
                out.append(f"__ERROR__: {e}")
        return pd.Series(out, dtype=object)
