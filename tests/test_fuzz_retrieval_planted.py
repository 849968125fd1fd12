"""Per-session slice of the planted-ground-truth retrieval fuzzer
(examples/fuzz_retrieval_planted.py, VERDICT r11 item 5): seeded corpora
with CONTROLLED query-term frequencies, lengths, and document
frequencies; bm25_topk must equal a first-principles replay exactly and
respect the tf/length/idf dominance theory; rrf_fuse must equal its
replay and satisfy the k0=60 dual-presence dominance theorem plus the
consensus-pin invariant. The full 20-seed sweep records
fuzz_retrieval_last.json; this runs a 3-seed slice inside the suite."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fuzz_retrieval_planted",
        os.path.join(_REPO, "examples", "fuzz_retrieval_planted.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_is_deterministic_and_planted():
    fz = _mod()
    a, b = fz.gen_corpus(7), fz.gen_corpus(7)
    assert a["docs"] == b["docs"], "corpus generation must be seed-pure"
    assert a["dominance"] == b["dominance"]
    text_of = dict(a["docs"])
    # the engineered pairs really carry the planted statistics
    hi, lo = a["dominance"]["tf"]
    assert text_of[hi].split().count("qalpha") == 2
    assert text_of[lo].split().count("qalpha") == 1
    assert len(text_of[hi].split()) == len(text_of[lo].split())
    short, long_ = a["dominance"]["len"]
    assert len(text_of[short].split()) < len(text_of[long_].split())
    assert (text_of[short].split().count("qalpha")
            == text_of[long_].split().count("qalpha"))
    rare, common = a["dominance"]["idf"]
    assert text_of[rare].split().count("qalpha") == 1
    assert text_of[common].split().count("qcharlie") == 1
    # qcharlie is planted COMMON: more docs contain it than qalpha
    df = {t: sum(1 for _, txt in a["docs"] if t in txt.split())
          for t in ("qalpha", "qcharlie")}
    assert df["qcharlie"] > df["qalpha"]


def test_replay_matches_closed_form_on_a_tiny_corpus():
    """The Python replay itself is pinned against a hand-computed BM25
    score, so a bug in the replay can't silently co-vary with one in the
    operator."""
    import math

    fz = _mod()
    docs = [(1, "qalpha w1 w2 w3"), (2, "w1 w2 w3 w4"), (3, "qalpha qalpha w1 w2")]
    got = fz.bm25_replay(docs, ["qalpha"], top_k=10)
    n, avgdl = 3, 4.0
    idf = math.log((n - 2 + 0.5) / (2 + 0.5) + 1.0)

    def w(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert got == [(3, round(w(2, 4), 6)), (1, round(w(1, 4), 6))]


def test_planted_invariants_live(spark):
    fz = _mod()
    for seed in (0, 1, 2):
        rec = fz.check_corpus(spark, seed)
        assert not rec["violations"], rec["violations"]
        assert rec["dominance_checks"] == 6
        assert rec["n_dual_presence"] > 0


def test_sweep_artifact_is_clean():
    """fuzz_retrieval_last.json is the recorded 20-seed sweep: present,
    >= 20 seeds, zero violations, and non-vacuous on every invariant
    family (dominance checks ran, dual-presence docs existed, consensus
    was pinned in some seeds)."""
    with open(os.path.join(_REPO, "fuzz_retrieval_last.json")) as f:
        d = json.load(f)
    s = d["summary"]
    assert s["seeds"] >= 20
    assert s["violations_total"] == 0 and s["failing_seeds"] == []
    assert s["dominance_checks"] >= 6 * s["seeds"]
    assert s["dual_presence_total"] > 0
    assert 0 < s["consensus_pinned_seeds"] < s["seeds"]
