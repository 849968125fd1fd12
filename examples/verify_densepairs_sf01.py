"""One-shot sf0.1 parity for the dense-pair oracles (VERDICT r6 item 4).

`doc_dup_clusters` / `doc_dedup_survivors` oracles are sf0.01-bounded in
the parity suite because DuckDB's recursive-CTE transitive closure blows
up on the ~913k-edge SimHash graph (the `reach` CTE materializes
~|component|^2 (id,label) pairs for the dense viral clusters — a limit of
the oracle CONSTRUCTION, not the engine). This script re-verifies both at
sf0.1 by replacing only the closure step: DuckDB still computes the
SimHash pair CTEs (1s at sf0.1), and a python-side union-find closes the
edge list in O(E α(N)) — an independent fixed-point construction, same as
the recursive CTE but without the quadratic intermediate.

`doc_contamination_top20` is also re-checked: its sf0.01 bound is STALE —
the train-side stop-shingle cap (max_doc_freq=64) added in round 4 cut
the shingle join enough that the unmodified oracle runs in ~1s at sf0.1,
so it gets a direct oracle-vs-Spark compare.

Comparison uses the parity suite's own normalization (sorted columns,
sorted rows, floats rounded to 9, dtype-kind check) — the driver's t2
semantics. Prints one JSON verdict line; exits non-zero on any mismatch.

    python examples/verify_densepairs_sf01.py [sf_dir]
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "oracle_parity", os.path.join(_REPO, "tests", "test_oracle_parity.py")
)
_parity = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_parity)
_normalize = _parity._normalize


class UnionFind:
    """Path-halving union-by-attachment to the smaller root: the canonical
    label IS the min doc_id of the component, matching both the Spark
    operator's min-label propagation and the oracle CTE's min(lbl)."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        r = p.setdefault(x, x)
        while r != p[r]:
            p[r] = p[p[r]]
            r = p[r]
        while x != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


def closure_oracle(con) -> pd.DataFrame:
    """(doc_id, cluster_id, cluster_size) for every document: DuckDB pair
    CTEs + python union-find — the recursive CTE's fixed point without the
    quadratic intermediate."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans.relational import (
        _SIMHASH_MD5_PAIR_CTES,
    )

    edges = con.sql(
        f"WITH {_SIMHASH_MD5_PAIR_CTES} SELECT id1, id2 FROM simpairs"
    ).fetchall()
    ids = [r[0] for r in con.sql("SELECT doc_id FROM documents").fetchall()]
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    comp = {i: uf.find(i) for i in ids}
    sizes: dict = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    return pd.DataFrame(
        {
            "doc_id": list(comp),
            "cluster_id": [comp[i] for i in comp],
            "cluster_size": [sizes[comp[i]] for i in comp],
        }
    )


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    scols, srows = _normalize(sdf)
    ocols, orows = _normalize(odf)
    row = {
        "cols_match": scols == ocols,
        "rows": len(srows),
        "rowcount_match": len(srows) == len(orows),
        "values_match": srows == orows,
    }
    if not row["values_match"]:
        row["first_diffs"] = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ][:3]
    return row


def main() -> None:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
        ORACLES,
        QUERIES,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in _parity.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark(app_name="vlds-densepair-verify")

    out: dict = {"sf_dir": sf_dir}

    comp = closure_oracle(con)
    out["doc_dup_clusters"] = compare(
        "doc_dup_clusters", QUERIES["doc_dup_clusters"](spark, sf_dir).toPandas(), comp
    )

    # survivors: same closure, aggregated like the registry oracle
    con.register("uf_comp", comp)
    surv = con.sql(
        """SELECT lang, count(*) AS n_survivors
           FROM uf_comp JOIN documents USING (doc_id)
           WHERE doc_id = cluster_id GROUP BY lang"""
    ).df()
    out["doc_dedup_survivors"] = compare(
        "doc_dedup_survivors",
        QUERIES["doc_dedup_survivors"](spark, sf_dir).toPandas(),
        surv,
    )

    # contamination: the registry oracle itself, unmodified, at sf0.1
    out["doc_contamination_top20"] = compare(
        "doc_contamination_top20",
        QUERIES["doc_contamination_top20"](spark, sf_dir).toPandas(),
        con.sql(ORACLES["doc_contamination_top20"]).df(),
    )

    print(json.dumps(out))
    bad = [
        k
        for k, v in out.items()
        if isinstance(v, dict) and not (v["cols_match"] and v["values_match"])
    ]
    if bad:
        print(f"FAIL sf0.1 parity: {bad}", file=sys.stderr)
        raise SystemExit(1)
    print(f"# all 3 dense-pair queries parity-green at {sf_dir}")


if __name__ == "__main__":
    main()
