"""Budget-bounded oracle parity sweep at an arbitrary scale factor.

`tests/test_oracle_parity.py` replays every oracle unbounded — correct for
the driver's sf0.01 gate, but at sf0.1 a handful of DuckDB oracle replays
(the connected-components family's iterative SQL) run for hours and wedge
the whole sweep. This harness runs the same per-query comparison with a
WATCHDOG on the DuckDB side (``Connection.interrupt()`` after ``--budget``
seconds): heavy oracles are recorded as ``skipped_oracle_budget`` instead
of blocking the other 138, so "does the whole registry still agree at 10x
the driver's data?" gets an answer in minutes.

Round-11 record (``parity_sf01_r11.json``): **141/141 oracles verified
bit-for-bit at sf0.1, zero mismatches, ZERO budget-skips** — the
components family's oracles were rewritten in r11 from the recursive
``reach`` CTE (working set sum(|component|^2), hours at sf0.1) to a
bounded chain of materialized min-label flood layers
(``plans/clusters.py:_closure_sql``) that DuckDB executes in ~1.4s.
Historical context: the r9/r10 sweeps (``parity_sf01_r9.json``) verified
138/141 with exactly those three budget-skipped and covered separately
(SCALE.md, ``components_sf01_last.json``).

    python examples/parity_sweep.py [--sf-dir DIR] [--budget 75]
                                    [--out parity_sweep_last.json]

Exit 1 on any mismatch or error; budget-skips exit 0 but are recorded.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize_fn():
    # one normalization, shared with both differential harnesses
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fuzz_differential.py")
    spec = importlib.util.spec_from_file_location("fuzz_differential", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._normalize


def run_sweep(spark, sf_dir: str, budget: float, log=print,
              only=None) -> dict:
    import duckdb

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
        ORACLES,
        QUERIES,
    )

    normalize = _normalize_fn()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    names = sorted(ORACLES if only is None else
                   [n for n in ORACLES if n in set(only)])
    ok, mismatch, skipped, errs = [], [], [], []
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as e:
            errs.append({"query": name, "side": "spark",
                         "error": str(e).split("\n")[0][:200]})
            continue
        # per-query cursor: an interrupt fired after this query completes
        # can only hit THIS cursor (closed below), never the shared
        # connection mid-way through a LATER oracle
        cur = con.cursor()
        done = threading.Event()

        def watchdog(c=cur):
            if not done.wait(budget):
                try:
                    c.interrupt()
                except Exception:
                    pass  # cursor already closed — query finished in time

        threading.Thread(target=watchdog, daemon=True).start()
        try:
            odf = cur.sql(ORACLES[name]).df()
            done.set()
        except Exception as e:
            done.set()
            msg = str(e).split("\n")[0]
            if "interrupt" in msg.lower():
                skipped.append(name)
                log(f"# {name}: oracle exceeded {budget}s budget, skipped")
            else:
                errs.append({"query": name, "side": "duck",
                             "error": msg[:200]})
            continue
        finally:
            cur.close()
        sc, sr = normalize(sdf)
        oc, orr = normalize(odf)
        if sc == oc and sr == orr:
            ok.append(name)
        else:
            mismatch.append({
                "query": name,
                "detail": (f"columns {sc} vs {oc}" if sc != oc else
                           f"rows {len(sr)} vs {len(orr)}"),
            })
            log(f"# MISMATCH {name}")
    con.close()
    return {"sf_dir": sf_dir, "budget_sec": budget, "ok": len(ok),
            "mismatch": mismatch, "skipped_oracle_budget": sorted(skipped),
            "errors": errs, "total": len(names), "ok_queries": sorted(ok)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--budget", type=float, default=75.0,
                    help="per-oracle DuckDB wall budget (seconds)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict the sweep to these oracle names (e.g. a "
                         "long-budget rerun of previously budget-skipped "
                         "heavy oracles)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "parity_sweep_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark

    spark = get_spark(app_name="vlds-parity-sweep", shuffle_partitions=32)
    res = run_sweep(spark, args.sf_dir, args.budget,
                    log=lambda m: print(m, file=sys.stderr),
                    only=args.only)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps({k: (len(v) if isinstance(v, list) else v)
                      for k, v in res.items()}))
    if res["mismatch"] or res["errors"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
