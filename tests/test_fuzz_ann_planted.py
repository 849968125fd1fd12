"""Per-session slice of the planted-embedding ANN fuzzer
(examples/fuzz_ann_planted.py, VERDICT r10 item 5's embedding leg):
seeded corpora with twin clusters at controlled cosine; brute-force top-k
must equal NumPy exactly, full-probe IVF must equal brute-force (zero
recall luck), SRP-LSH twin recall must meet the hyperplane banding
floor, and embedding_near_dup_pairs' exact-verify stage must emit no
pair below threshold. Full 20-seed sweep records fuzz_ann_last.json."""

import importlib.util
import math
import os


def _mod():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fuzz_ann_planted",
        os.path.join(repo, "examples", "fuzz_ann_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_is_deterministic_and_planted():
    fz = _mod()
    a, b = fz.gen_corpus(3), fz.gen_corpus(3)
    assert a["dim"] == b["dim"]
    assert sorted(a["vectors"]) == sorted(b["vectors"])
    for i in a["vectors"]:
        assert (a["vectors"][i] == b["vectors"][i]).all()
    assert a["twins"] == b["twins"]
    # planted cosines land near their targets; everything is unit-norm
    for _, _, target, true_c in a["twins"]:
        assert abs(true_c - target) < 0.04, (target, true_c)
    import numpy as np
    for v in a["vectors"].values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_candidate_prob_curve():
    fz = _mod()
    assert fz.candidate_prob(1.0) == 1.0
    assert fz.candidate_prob(0.9988) > 0.98
    # orthogonal vectors almost never collide through hamming<=1
    assert fz.candidate_prob(0.0) < 0.04
    # monotone in cosine
    cs = [0.3, 0.6, 0.9, 0.99]
    ps = [fz.candidate_prob(c) for c in cs]
    assert ps == sorted(ps)
    assert math.isfinite(fz.candidate_prob(-1.0))


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1, 2):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]


def test_sweep_artifact_is_clean():
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "fuzz_ann_last.json")) as f:
        d = json.load(f)
    assert len(d["seeds"]) >= 20
    assert d["n_violations"] == 0
    assert all(not c["violations"] for c in d["corpora"])
