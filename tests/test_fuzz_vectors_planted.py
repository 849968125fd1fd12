"""Per-session slice of the planted vector-preprocessing fuzzer
(examples/fuzz_vectors_planted.py, round 13): dyadic-grid vectors whose
int8 scale is an exact power of two and whose roundtrip is the identity
by construction, half-edge plants pinning the floor(x*s+0.5)
round-half-toward-+infinity convention against half-even drift, an
off-grid element with closed-form reconstruction error, Pythagorean
exact-integer norms, and the zero-vector contracts. The
embedding_int8_roundtrip oracle replays the same arithmetic bit-for-bit,
so only these plants can catch a quantization-convention drift. The full
20-seed sweep records fuzz_vectors_last.json."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_vectors_planted",
        os.path.join(_REPO, "examples", "fuzz_vectors_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pythagorean_table_is_exact():
    """The fuzzer's norm expectations are integers by number theory, not
    by running anything: every tuple's squared sum is a perfect square."""
    fz = _mod()
    for v, n in fz.PYTHAGOREAN:
        assert sum(x * x for x in v) == n * n
        assert float(int(n)) == n


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["vectors"] >= 15


def test_sweep_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_vectors_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
