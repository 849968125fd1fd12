"""Smoke slice of the embedding-dimension scaling stress
(examples/stress_embedding_dims.py, round 13): the r13 review's
O(d^2)-per-vector normalization survived every test because the whole
suite runs embeddings at dim 64 — dimension is a scale axis row-count
sweeps can't see. The harness times the embedding-family hot paths at
64 -> 1024 and fails on a super-linear effective exponent; this slice
runs the ops at two small dims for harness correctness (not timing) and
pins the committed artifact."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "stress_embedding_dims",
        os.path.join(_REPO, "examples", "stress_embedding_dims.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ops_run_at_both_dims(spark):
    fz = _mod()
    for dim in (8, 32):
        df = fz.build_corpus(spark, 200, dim)
        try:
            ops = fz.run_ops(spark, df, dim, n_queries=5)
            assert set(ops) == {"l2_normalize", "int8_roundtrip",
                                "srp_signature", "embedding_contamination",
                                "cosine_topk"}
            for fn in ops.values():
                fn()  # each op must execute cleanly at this dim
        finally:
            df.unpersist()


def test_artifact_has_no_superlinear_op():
    with open(os.path.join(_REPO, "stress_dims_last.json")) as f:
        d = json.load(f)
    assert d["dims"][-1] / d["dims"][0] >= 8  # a span a quadratic can't hide in
    assert d["superlinear"] == {}
    assert set(d["exponents"]) == {"l2_normalize", "int8_roundtrip",
                                   "srp_signature", "embedding_contamination",
                                   "cosine_topk"}
    assert all(e <= d["max_exponent_allowed"] for e in d["exponents"].values())
