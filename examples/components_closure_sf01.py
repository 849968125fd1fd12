"""Cross-engine parity for the components family, with an UNBOUNDED closure.

Since round 11 the three connected-components registry oracles
(``doc_dedup_keep_best``, ``doc_dedup_survivors``, ``doc_dup_clusters``)
close the SimHash pair graph with a FIXED-DEPTH chain of min-label flood
layers (``plans/clusters.py:_closure_sql``, depth 8 + a poisoned
convergence check) — single-statement SQL the driver and parity_sweep run
verbatim in budget at every scale factor. (The r1-r10 ``reach`` recursive
CTE had working set sum(|component|^2) and was budget-infeasible at sf0.1;
VERDICT r10 item 4 prescribed this replacement.)

This harness is the INDEPENDENT check of the depth choice: it re-closes
the same edge set with UNBOUNDED iteration to an observed fixed point,
so a regression in the corpus (a cluster whose diameter exceeds the fixed
depth) is caught by construction, not just by the in-oracle poison:

1. The registry oracle's own text, up to (and excluding) the ``l0`` flood
   layer, is SLICED OUT PROGRAMMATICALLY and executed verbatim to
   materialize the edge set — tokenization, per-token md5, SimHash votes,
   bands, candidate pairs, hamming filter all stay the exact SQL the
   driver replays at sf0.01. Nothing is re-stated by hand.
2. The closure runs as min-label flooding rounds in temp tables
   (``lbl' = min(lbl, min over neighbors' lbl)``) UNTIL a fixed point —
   no depth bound. Over a SYMMETRIC edge set (the oracle builds ``edges``
   as UNION ALL of both directions) this converges to min(component) per
   node, the same fixed point the oracle's bounded chain must reach.
3. Each oracle's FINAL select (everything after the shared ``comp``
   clause) is again executed verbatim against the materialized ``comp``.
4. The Spark side runs the registry query unmodified at sf0.1; both
   sides are compared with the driver's normalization (shared with
   examples/fuzz_differential.py).

    python examples/components_closure_sf01.py [--sf-dir /root/testdata/sf0.1]
                                               [--out components_sf01_last.json]

Exit 1 on any mismatch, non-convergence, or slicing drift (if the oracle
text is ever refactored, the hard asserts below fail loudly rather than
silently verifying something else).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
COMPONENT_QUERIES = [
    "doc_dedup_keep_best", "doc_dedup_survivors", "doc_dup_clusters",
]

# the exact shared clauses the slicer anchors on — if the registry oracle
# text drifts structurally, the partition() asserts below fail loudly. The
# comp marker is derived from the SAME generator the oracles use, so the
# two can only move in lockstep (slicing the genuine comp clause), never
# silently anchor on stale text.
_CLOSURE_MARKER = ",\nl0 AS MATERIALIZED ("


def _comp_marker() -> str:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans.clusters import (
        _COMPONENT_CLOSURE,
    )

    comp = _COMPONENT_CLOSURE.rsplit(",\n", 1)[1]
    assert comp.startswith("comp AS ("), "closure generator drifted"
    return comp


def _normalize_fn():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fuzz_differential.py")
    spec = importlib.util.spec_from_file_location("fuzz_differential", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._normalize


def slice_oracle(sql: str) -> tuple[str, str]:
    """(edge_prefix, final_select): the oracle's own text split around the
    flood-layer closure. edge_prefix is a complete WITH chain ending at
    ``edges``; final_select is everything after the comp clause, rewritten
    as a standalone statement reading the ``comp`` temp table."""
    sql = sql.strip()
    prefix, sep, _ = sql.partition(_CLOSURE_MARKER)
    assert sep, "oracle text drifted: l0 closure marker not found"
    assert prefix.startswith("WITH"), "oracle text drifted"
    head, sep, tail = sql.partition(_comp_marker())
    assert sep, "oracle text drifted: comp marker not found"
    tail = tail.lstrip()
    if tail.startswith(","):
        final = "WITH " + tail[1:].lstrip()
    else:
        final = tail
    return prefix, final


def flood_components(con, edges_table: str, nodes_from: str,
                     max_rounds: int = 200) -> int:
    """Min-label flooding over a SYMMETRIC edge table (columns a, b) in
    DuckDB temp tables: lbl' = min(lbl, neighbors' lbl) until no change.
    Creates temp table ``comp(doc_id, cluster_id)`` — the same fixed point
    the oracle's ``comp AS (SELECT id, min(lbl) FROM reach GROUP BY id)``
    defines (min over the connected component), in O(diameter) rounds of
    O(|E|) work instead of one O(sum |C|^2) enumeration. ``nodes_from`` is
    a FROM-clause source with a ``doc_id`` column (e.g. ``documents``).
    Property-tested against a Python union-find on random graphs in
    tests/test_round10_fixes.py. Returns the round count."""
    con.sql("DROP TABLE IF EXISTS lbl")
    con.sql("DROP TABLE IF EXISTS comp")
    # a prior call that crashed mid-round may have left nxt behind —
    # without this, the rerun dies at CREATE TEMP TABLE nxt (ADVICE r10)
    con.sql("DROP TABLE IF EXISTS nxt")
    con.sql(f"CREATE TEMP TABLE lbl AS "
            f"SELECT doc_id AS id, doc_id AS lbl FROM {nodes_from}")
    rounds = 0
    while True:
        rounds += 1
        con.sql(
            f"CREATE TEMP TABLE nxt AS "
            f"SELECT id, min(lbl) AS lbl FROM ("
            f"  SELECT id, lbl FROM lbl"
            f"  UNION ALL"
            f"  SELECT e.b AS id, l.lbl FROM lbl l "
            f"  JOIN {edges_table} e ON e.a = l.id"
            f") u GROUP BY id")
        changed = con.sql(
            "SELECT count(*) FROM nxt JOIN lbl USING (id) "
            "WHERE nxt.lbl <> lbl.lbl").fetchone()[0]
        con.sql("DROP TABLE lbl")
        con.sql("ALTER TABLE nxt RENAME TO lbl")
        if changed == 0:
            break
        if rounds > max_rounds:
            # RuntimeError, not SystemExit: this helper is reused from
            # tests, where SystemExit reads as a harness error rather than
            # a failed check (ADVICE r10); main() maps it to exit 1
            raise RuntimeError(
                f"flooding did not converge in {max_rounds} rounds")
    con.sql("CREATE TEMP TABLE comp AS "
            "SELECT id AS doc_id, lbl AS cluster_id FROM lbl")
    return rounds


def run(sf_dir: str, out_path: str, log=print) -> dict:
    import duckdb

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
        ORACLES,
        QUERIES,
    )

    normalize = _normalize_fn()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # 1. edge set via the oracle's own SQL (identical prefix in all three —
    #    assert that, then execute it once)
    prefixes = {n: slice_oracle(ORACLES[n])[0] for n in COMPONENT_QUERIES}
    assert len(set(prefixes.values())) == 1, \
        "component oracles no longer share one pair-generation prefix"
    prefix = prefixes[COMPONENT_QUERIES[0]]
    t0 = time.time()
    con.sql(f"CREATE TEMP TABLE t_edges AS {prefix} SELECT * FROM edges")
    n_edges = con.sql("SELECT count(*) FROM t_edges").fetchone()[0]
    edge_sec = round(time.time() - t0, 1)
    log(f"# edges materialized via oracle prefix: {n_edges} rows "
        f"({edge_sec}s)")

    # 2. min-label flooding to the comp fixed point
    t0 = time.time()
    rounds = flood_components(con, "t_edges", "documents")
    close_sec = round(time.time() - t0, 1)
    log(f"# closure converged in {rounds} rounds ({close_sec}s)")

    # 3+4. each oracle's own final select vs the Spark registry query
    spark = get_spark(app_name="vlds-components-sf01", shuffle_partitions=32)
    results, ok = [], True
    for name in COMPONENT_QUERIES:
        final = slice_oracle(ORACLES[name])[1]
        t0 = time.time()
        odf = con.sql(final).df()
        oracle_sec = round(time.time() - t0, 1)
        t0 = time.time()
        sdf = QUERIES[name](spark, sf_dir).toPandas()
        spark_sec = round(time.time() - t0, 1)
        sc, sr = normalize(sdf)
        oc, orr = normalize(odf)
        match = sc == oc and sr == orr
        ok &= match
        results.append({
            "query": name, "values_match": match, "rows": len(sr),
            "spark_sec": spark_sec, "oracle_final_sec": oracle_sec,
        })
        log(f"# {name}: values_match={match} rows={len(sr)}")
    con.close()
    rec = {
        "sf_dir": sf_dir, "n_edges": n_edges, "edge_prefix_sec": edge_sec,
        "flood_rounds": rounds, "closure_sec": close_sec,
        "queries": results, "all_match": ok,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "components_sf01_last.json"))
    args = ap.parse_args()
    rec = run(args.sf_dir, args.out, log=lambda m: print(m, file=sys.stderr))
    print(json.dumps({k: rec[k] for k in
                      ("n_edges", "flood_rounds", "closure_sec",
                       "all_match")}))
    if not rec["all_match"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
