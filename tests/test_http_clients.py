"""Fake-server tests for the three HTTP clients (round-1 verdict item #5).

A stdlib ``http.server`` running in a daemon thread plays Ollama
(``POST /api/generate``, reference runners/run_summarization_ollama_
mapreduce.py:37-49) and an OpenAI-compatible judge endpoint
(``POST /v1/chat/completions``, reference evaluate/evaluate_summaries_
semantic.py:38-122). Behaviors are keyed off markers in the prompt text so
one server exercises happy path, HTTP errors, malformed JSON, and timeouts.
No live service needed.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pandas as pd
import pytest

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.judge import (
    OpenAICompatibleJudge,
    llm_judge_scores,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.critique import (
    OllamaCritic,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.summarizer import (
    OllamaSummarizer,
)

REQUESTS: list[dict] = []  # (path, headers, body) capture for shape asserts


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def _read(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n))
        REQUESTS.append(
            {
                "path": self.path,
                "auth": self.headers.get("Authorization"),
                "content_type": self.headers.get("Content-Type"),
                "body": body,
            }
        )
        return body

    def _send(self, payload: bytes, status: int = 200) -> None:
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):  # noqa: N802 - http.server API
        body = self._read()
        if self.path == "/api/generate":
            prompt = body.get("prompt", "")
            if "__HTTP500__" in prompt:
                self._send(b'{"error": "boom"}', status=500)
            elif "__MALFORMED__" in prompt:
                self._send(b"this is not json")
            elif "__MISSING_KEY__" in prompt:
                self._send(b'{"not_response": 1}')
            elif "__SLOW__" in prompt:
                time.sleep(1.5)
                self._send(json.dumps({"response": "too late"}).encode())
            else:
                self._send(
                    json.dumps({"response": f"SUM({len(prompt)})"}).encode()
                )
        elif self.path == "/v1/chat/completions":
            content = body["messages"][0]["content"]
            if "__MALFORMED__" in content:
                inner = "not json at all"
            elif "Summary Coherence" in content:
                inner = json.dumps({"score": 5})
            else:
                inner = json.dumps({"score": 4})
            self._send(
                json.dumps(
                    {"choices": [{"message": {"content": inner}}]}
                ).encode()
            )
        else:
            self._send(b'{"error": "unknown path"}', status=404)


@pytest.fixture(scope="module")
def server_url():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_ollama_summarizer_happy_path_and_request_shape(server_url):
    s = OllamaSummarizer(base_url=server_url, model="llama3.2:3b", max_new_tokens=77)
    REQUESTS.clear()
    out = s(pd.Series(["hello world", "xin chào"]))
    assert list(out) == [
        f"SUM({len(s.prompt_template.format(text='hello world'))})",
        f"SUM({len(s.prompt_template.format(text='xin chào'))})",
    ]
    # request shape pinned to the reference payload (MR:38-46)
    assert len(REQUESTS) == 2
    for r in REQUESTS:
        assert r["path"] == "/api/generate"
        assert r["content_type"] == "application/json"
        assert r["body"]["model"] == "llama3.2:3b"
        assert r["body"]["stream"] is False
        assert r["body"]["options"] == {"num_predict": 77}
    assert "hello world" in REQUESTS[0]["body"]["prompt"]


def test_ollama_summarizer_error_rows_not_failures(server_url):
    s = OllamaSummarizer(base_url=server_url)
    out = s(pd.Series(["__HTTP500__", "__MALFORMED__", "__MISSING_KEY__", "fine"]))
    assert out[0].startswith("__ERROR__:")
    assert out[1].startswith("__ERROR__:")
    assert out[2].startswith("__ERROR__:")
    assert out[3].startswith("SUM(")


def test_ollama_summarizer_timeout(server_url):
    s = OllamaSummarizer(base_url=server_url, timeout=0.3)
    out = s(pd.Series(["__SLOW__"]))
    assert out[0].startswith("__ERROR__:")


def test_ollama_summarizer_unreachable_server():
    s = OllamaSummarizer(base_url="http://127.0.0.1:1", timeout=0.5)
    out = s(pd.Series(["anything"]))
    assert out[0].startswith("__ERROR__:")


def test_ollama_summarizer_through_spark_udf(spark, server_url):
    df = spark.createDataFrame([(1, "spark row one"), (2, "row two")], ["doc_id", "text"])
    s = OllamaSummarizer(base_url=server_url)
    rows = {
        r.doc_id: r.summary
        for r in s.summarize_df(df, "text", "summary").collect()
    }
    assert rows[1].startswith("SUM(") and rows[2].startswith("SUM(")


def test_ollama_critic_prompt_pair(server_url):
    critic = OllamaCritic(OllamaSummarizer(base_url=server_url))
    REQUESTS.clear()
    c = critic.critique("tóm tắt ngắn", "văn bản gốc dài hơn")
    assert c.startswith("SUM(")
    refined = critic.refine("tóm tắt ngắn", c, "văn bản gốc dài hơn")
    assert refined.startswith("SUM(")
    crit_prompt = REQUESTS[0]["body"]["prompt"]
    refine_prompt = REQUESTS[1]["body"]["prompt"]
    assert "TÓM TẮT" in crit_prompt and "GỐC" in crit_prompt
    assert "PHÊ BÌNH" in refine_prompt  # refine carries the critique forward


def test_openai_judge_happy_and_malformed(server_url):
    j = OpenAICompatibleJudge(
        base_url=f"{server_url}/v1", api_key="test-key", model="judge-1"
    )
    REQUESTS.clear()
    c, h = j("generated summary", "reference summary")
    # 1-5 normalized to 0-1 exactly as the G-Eval output
    assert (c, h) == (0.75, 1.0)
    # one call per named metric (EVAL:283-307): correctness sees generated +
    # reference, coherence sees the generated text only
    assert len(REQUESTS) == 2
    corr, coh = REQUESTS[0], REQUESTS[1]
    for r in (corr, coh):
        assert r["path"] == "/v1/chat/completions"
        assert r["auth"] == "Bearer test-key"
        assert r["body"]["model"] == "judge-1"
        assert r["body"]["messages"][0]["role"] == "user"
    assert "Summary Correctness" in corr["body"]["messages"][0]["content"]
    assert "REFERENCE" in corr["body"]["messages"][0]["content"]
    assert "Summary Coherence" in coh["body"]["messages"][0]["content"]
    assert "REFERENCE" not in coh["body"]["messages"][0]["content"]
    with pytest.raises(Exception):
        j("__MALFORMED__", "reference")


def test_openai_judge_error_column_through_runner(spark, server_url):
    """Failed judge cases become status='failed' rows (per-case skip
    semantics, EVAL:369-382), never task failures."""
    j = OpenAICompatibleJudge(
        base_url=f"{server_url}/v1", api_key="k", model="judge-1"
    )
    df = spark.createDataFrame(
        [(1, "good summary", "ref"), (2, "__MALFORMED__", "ref")],
        ["doc_id", "summary", "reference"],
    )
    rows = {r.doc_id: r for r in llm_judge_scores(df, j).collect()}
    assert rows[1].status == "ok" and rows[1].llm_correctness == 0.75
    assert rows[2].status == "failed" and rows[2].llm_correctness is None
