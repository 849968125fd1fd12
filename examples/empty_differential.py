"""Empty-input differential sweep: every oracled registry query over
zero-row tables, Spark vs DuckDB.

The round-9 fuzzer's one real finding (rollup_empty_input — Spark's
grouping-set aggregates drop the ANSI grand-total row over empty input,
see operators/rollup.py) suggested empty input is a divergence-rich axis,
so this sweep drives the WHOLE 141-oracle registry over schema-identical
zero-row parquet tables and diffs both engines with the driver's
normalization. It answers a question the sf-scaled parity suite cannot:
do the engines agree when every scan returns nothing — the degenerate
slice any 100 TB pipeline hits whenever a filter matches zero files?

Round-9 record: **138/141 agree; the only 3 diffs are the registry's
grouping-set queries** (`lineitem_grouping_sets`, `region_nation_rollup`,
`returnflag_cube`) — exactly the known rollup_empty_input class, no new
classes. Those three KEEP Spark's plain rollup/cube in the registry: the
ansi_rollup/ansi_cube wrappers exist for callers that need the standard's
one-row contract, but their guard aggregate is an extra scan of the input
— the wrong default at 100 TB for a row that only differs on empty input.
The divergence is pinned (tests/test_round9_fixes.py + the known-diff
list below); anything NEW here exits non-zero.

    python examples/empty_differential.py [--out empty_sweep_last.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# the triaged rollup_empty_input class (operators/rollup.py): Spark emits
# zero rows, DuckDB the ANSI grand-total row(s)
KNOWN_EMPTY_DIVERGENT = {
    "lineitem_grouping_sets", "region_nation_rollup", "returnflag_cube",
}


# one normalization, not three: reuse the fuzzer's copy so the two
# differential harnesses can never disagree on what counts as a divergence
def _fuzz_module():
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fuzz_differential.py")
    spec = importlib.util.spec_from_file_location("fuzz_differential", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_FZ = _fuzz_module()
_normalize = _FZ._normalize


def build_empty_dir(src_sf_dir: str, dst: str, rows: int = 0) -> None:
    """Parquet twins with the source dir's exact schemas and the first
    ``rows`` rows (0 = empty — the default sweep; 1 or a handful probes
    single-row aggregate/window edges: stddev over one value, frames
    shorter than their bounds, joins whose FK partner didn't make the
    cut)."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{src_sf_dir}/{t}.parquet' LIMIT {rows}) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


def run_sweep(spark, empty_dir: str) -> dict:
    import duckdb

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
        ORACLES,
        QUERIES,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'")
    ok, known = 0, []
    new_diffs, errs = [], []
    for name in sorted(ORACLES):
        try:
            sdf = QUERIES[name](spark, empty_dir).toPandas()
        except Exception as e:
            errs.append({"query": name, "side": "spark",
                         "error": str(e).split("\n")[0][:300]})
            continue
        try:
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:
            errs.append({"query": name, "side": "duck",
                         "error": str(e).split("\n")[0][:300]})
            continue
        sc, sr = _normalize(sdf)
        oc, orr = _normalize(odf)
        if sc == oc and sr == orr:
            ok += 1
        elif name in KNOWN_EMPTY_DIVERGENT and sc == oc and not sr and orr:
            # columns must STILL match — a schema divergence on a pinned
            # query is a new class, not the known rows-only one
            known.append(name)
        else:
            new_diffs.append({
                "query": name,
                "detail": (f"columns {sc} vs {oc}" if sc != oc else
                           f"rows {len(sr)} vs {len(orr)}: "
                           f"{sr[:2]} vs {orr[:2]}"),
            })
    con.close()
    return {"ok": ok, "known_divergent": sorted(known),
            "new_diffs": new_diffs, "errors": errs,
            "total": len(ORACLES)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src-sf-dir", default="/root/testdata/sf0.01",
                    help="schema source for the zero-row twins")
    ap.add_argument("--rows", type=int, default=0,
                    help="rows per table (0 = empty sweep; small N probes "
                         "single-/few-row aggregate and window edges). "
                         "The known grouping-set divergence only applies "
                         "at 0 — with rows present the pinned queries must "
                         "match exactly.")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "empty_sweep_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark

    empty_dir = f"/tmp/vlds_sf_rows{args.rows}"
    build_empty_dir(args.src_sf_dir, empty_dir, rows=args.rows)
    spark = get_spark(app_name="vlds-empty-sweep", shuffle_partitions=8)
    res = run_sweep(spark, empty_dir)
    res["rows_per_table"] = args.rows
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps({k: (len(v) if isinstance(v, list) else v)
                      for k, v in res.items()}))
    if res["new_diffs"] or res["errors"]:
        for d in res["new_diffs"]:
            print(f"# NEW DIFF {d['query']}: {d['detail'][:200]}",
                  file=sys.stderr)
        for e in res["errors"]:
            print(f"# ERR {e['query']} ({e['side']}): {e['error']}",
                  file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
