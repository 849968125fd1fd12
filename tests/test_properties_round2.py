"""Property tests for the round-2 operators — pure-Python replicas of the
Catalyst arithmetic (hash splits, packing bins, BM25 postings, components),
randomized by hypothesis. Spark parity of the same arithmetic is pinned by
the unit suites and DuckDB oracles; these pin the *invariants*."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


def _hash_uniform(doc_id: int, salt: str) -> float:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15]
    return int(h, 16) / float(1 << 60)


def test_split_replica_realized_fractions_match_weights():
    # md5 uniformity: over a large id set the replica arithmetic (the same
    # formula the DuckDB oracles replay) realizes the 80/10/10 weights
    n = 20000
    counts = {"train": 0, "val": 0, "test": 0}
    for i in range(n):
        r = _hash_uniform(i, "split")
        counts["train" if r < 0.8 else ("val" if r < 0.9 else "test")] += 1
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01


def test_split_replica_matches_production(spark):
    # the pure-Python replica used by these property tests must agree with
    # the production Catalyst expression — one Spark action, fixed id set
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.sampling import (
        assign_split,
    )

    ids = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"] for r in assign_split(ids, "doc_id").collect()}
    for i in range(500):
        r = _hash_uniform(i, "split")
        want = "train" if r < 0.8 else ("val" if r < 0.9 else "test")
        assert got[i] == want, i


@given(st.lists(st.integers(1, 400), min_size=1, max_size=200), st.integers(50, 500))
@settings(max_examples=300, deadline=None)
def test_start_offset_packing_invariants(lens, budget):
    # replicate bucket_running_sum's bin rule: bin = floor(start_offset/budget)
    bins = {}
    seq = []
    off = 0
    for n in lens:
        k = off // budget
        bins.setdefault(k, []).append(n)
        seq.append(k)
        off += n
    # conservation
    assert sum(sum(v) for v in bins.values()) == sum(lens)
    # multi-doc bins exceed the budget by strictly less than their last doc
    for v in bins.values():
        if len(v) > 1:
            assert sum(v) < budget + v[-1]
    # bin indices start at 0 and are non-decreasing in doc order
    assert seq[0] == 0
    assert all(a <= b for a, b in zip(seq, seq[1:]))


@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=0, max_size=200),
    st.integers(0, 30),
)
@settings(max_examples=200, deadline=None)
def test_min_label_fixpoint_is_component_min(edges, extra_node):
    # the CC loop's fixpoint (label = min reachable id) equals brute-force
    # union-find components
    nodes = {extra_node} | {a for a, _ in edges} | {b for _, b in edges}
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}

    # min-label flooding with pointer jumping, as components.py implements
    sym = {}
    for a, b in edges:
        if a != b:
            sym.setdefault(a, set()).add(b)
            sym.setdefault(b, set()).add(a)
    lbl = {n: min([n] + [m for m in sym.get(n, ())]) for n in nodes}
    for _ in range(64):
        nxt = {
            n: min([lbl[n]] + [lbl[m] for m in sym.get(n, ())]) for n in nodes
        }
        nxt = {n: nxt[nxt[n]] if nxt[n] in nxt else nxt[n] for n in nodes}
        if nxt == lbl:
            break
        lbl = nxt
    assert lbl == want
