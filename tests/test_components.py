"""connected_components / dedup_keep_canonical on known graphs: chains that
only close transitively, singletons, convergence on multi-hop paths."""

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
    connected_components,
    dedup_keep_canonical,
)


def _components(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, "id1 long, id2 long")
    n = spark.createDataFrame([(i,) for i in nodes], "doc_id long") if nodes else None
    out = connected_components(e, nodes=n, **kw).collect()
    return {r["doc_id"]: r["component"] for r in out}


def test_transitive_chain_closes(spark):
    # 1-2, 2-3, 3-4: no direct 1-4 pair, but one component
    got = _components(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_and_singletons(spark):
    got = _components(spark, [(10, 11), (20, 21), (21, 22)], nodes=[10, 11, 20, 21, 22, 99])
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == got[22] == 20
    assert got[99] == 99


def test_long_path_converges_within_rounds(spark):
    # path of 12 nodes: min label must flood end-to-end
    edges = [(i, i + 1) for i in range(12)]
    got = _components(spark, edges)
    assert set(got.values()) == {0}


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _components(spark, [(5, 5), (5, 6), (6, 5), (5, 6)])
    assert got == {5: 5, 6: 5}


def test_dedup_keep_canonical_keeps_min_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 4), (3, 5)], "id1 long, id2 long")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    # clusters {1,2,4} -> 1, {3,5} -> 3, singleton {0} -> 0
    assert kept == [0, 1, 3]


def test_dedup_keep_canonical_survives_foreign_pair_endpoint(spark):
    """A pair table may reference ids outside docs (superset corpus, or a
    stale pair snapshot after an earlier gate removed the endpoint). The
    kept id must be the minimum member PRESENT in docs — selecting the raw
    component label (a ghost) would silently drop the whole cluster."""
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in (3, 4, 7)], "doc_id long, text string"
    )
    # id 1 links 3 and 4 but is not in docs; the cluster min-in-docs is 3
    pairs = spark.createDataFrame([(1, 3), (1, 4)], "id1 long, id2 long")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == [3, 7]


def test_dedup_keep_best_string_ids_tie_break_is_min_id(spark):
    """Tie-break must be deterministic for ANY id type: with string ids the
    old max_by(struct(score, -id)) negation yielded NULL (ANSI off),
    degrading the documented min-id tie-break to arbitrary."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [("a.txt", 1.0), ("b.txt", 1.0), ("c.txt", 0.5)],
        "doc_id string, score double",
    )
    pairs = spark.createDataFrame(
        [("a.txt", "b.txt"), ("b.txt", "c.txt")], "id1 string, id2 string"
    )
    kept = [
        r.doc_id for r in dedup_keep_best(docs, pairs, score_col="score").collect()
    ]
    assert kept == ["a.txt"]  # equal best scores -> min id wins, every run


def test_non_convergence_warns(spark):
    import warnings

    # a 16-node path cannot settle in one round even with the min-neighbor
    # seed + pointer jumping; under-merged output must be loud, not silent
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "id1 long, id2 long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_components(edges, max_rounds=1)
        out.collect()
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("did not converge" in m for m in msgs)


def test_chain_converges_with_contraction(spark):
    # a 64-node path is the contraction-unfriendly worst case (no dense
    # clusters): seeds halve the chain, the contracted loop must still
    # close the rest within the default round budget
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id1 long, id2 long"
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(edges).collect()
    assert len(comp) == 64
    assert {r.component for r in comp} == {0}


def test_altstar_equals_flooding_on_planted_graphs(spark):
    """Round-13 experiment arm (VERDICT r12 item 6): the alternating
    large-star/small-star variant must produce the identical
    (id, component) labeling as the default flooding implementation on
    every planted shape — chain, disjoint cliques, hub star, random
    Erdos-Renyi with isolated nodes — with a rounds stat reported."""
    import random

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
        connected_components_altstar,
    )

    rng = random.Random(13)
    er_nodes = list(range(300, 340))
    er_edges = [tuple(rng.sample(er_nodes, 2)) for _ in range(25)]
    cases = [
        # (edges, nodes)
        ([(i, i + 1) for i in range(15)], None),                       # chain
        ([(a, b) for a in range(20, 25) for b in range(a + 1, 25)]
         + [(c, d) for c in range(30, 33) for d in range(c + 1, 33)],
         None),                                                        # cliques
        ([(100, v) for v in range(101, 120)], None),                   # hub star
        (er_edges, er_nodes + [999]),                                  # random + isolated
        ([(5, 5), (5, 6), (6, 5)], None),                              # self-loop/dup
    ]
    for edges, nodes in cases:
        e = spark.createDataFrame(edges, "id1 long, id2 long")
        n = (spark.createDataFrame([(i,) for i in nodes], "doc_id long")
             if nodes else None)
        want = {r["doc_id"]: r["component"]
                for r in connected_components(e, nodes=n).collect()}
        stats: dict = {}
        got = {r["doc_id"]: r["component"]
               for r in connected_components_altstar(e, nodes=n, stats=stats).collect()}
        assert got == want, (edges[:3], got, want)
        assert stats["rounds"] >= 1
