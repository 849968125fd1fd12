"""Two-scale-factor superlinearity guard (VERDICT r5 item 3).

The 100x-scale claims in SCALE.md are plan-audited and skew-stressed but a
plan audit can miss an accidentally quadratic composition. This script
times every bench.py headline query at TWO scale factors in ONE session
(default sf0.01 and sf0.1 — a 10x data ratio) and computes each query's
effective scaling exponent

    e = log(t_big / t_small) / log(data_ratio)

so e == 1 is perfectly linear, e < 1 is sublinear (fixed overhead
dominates — the common case at these tiny sfs, where a ~0.3-0.5s session
floor swamps per-row cost), and e materially above 1 is the tripwire for
a plan whose cost grows faster than its input.

Noise discipline: the two scale factors are interleaved WITHIN each rep
(small, big, small, big, ...) so a box-wide slow phase hits both sides of
the ratio, and each side keeps its best-of-N. That is the same lesson as
bench.py's best-of-3: on this box the same plan has measured 3s and 52s
minutes apart, so only same-session interleaved numbers are comparable.

Flag rule: a query is flagged superlinear only if BOTH
  * its exponent exceeds MAX_EXPONENT (default 1.3 — i.e. >20x runtime for
    10x data), AND
  * its big-sf time exceeds MIN_BIG_SEC (default 2s — ratios of two
    sub-second timings are overhead noise, not evidence),
which keeps the guard quiet on fixed-cost-dominated queries while still
catching anything quadratic (a true n^2 plan shows e ~= 2 and a big-sf
blowup long before 100 TB).

    python examples/bench_scaling.py [--reps N] [--queries a,b,c]

Prints a per-query table (sorted by exponent, descending), writes the full
record to scaling_last.json next to the repo's bench_last.json, and exits
non-zero if any query trips the guard — usable as a CI tripwire.
"""

import argparse
import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_EXPONENT = 1.3
MIN_BIG_SEC = 2.0


def effective_exponent(t_small: float, t_big: float, data_ratio: float) -> float:
    """log-ratio exponent; clamped at a tiny floor so a 0.0s timing (clock
    granularity) can't produce +/-inf."""
    eps = 1e-3
    return math.log(max(t_big, eps) / max(t_small, eps)) / math.log(data_ratio)


def is_superlinear(t_small: float, t_big: float, data_ratio: float,
                   max_exponent: float = MAX_EXPONENT,
                   min_big_sec: float = MIN_BIG_SEC) -> bool:
    return (
        t_big > min_big_sec
        and effective_exponent(t_small, t_big, data_ratio) > max_exponent
    )


def main() -> None:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        persistent_rdd_ids,
        release_rdds,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES
    from bench import HEADLINE

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default=os.environ.get(
        "SPARK_GRAFT_SCALE_SMALL", "/root/testdata/sf0.01"))
    ap.add_argument("--big", default=os.environ.get(
        "SPARK_GRAFT_SCALE_BIG", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: bench.py HEADLINE)")
    args = ap.parse_args()

    def _sf(d):
        try:
            return float(d.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            raise SystemExit(f"cannot parse scale factor from {d!r}")

    data_ratio = _sf(args.big) / _sf(args.small)
    names = args.queries.split(",") if args.queries else list(HEADLINE)

    spark = get_spark(app_name="vlds-bench-scaling")
    # warm both parquet footers/codegen so rep 1 isn't absorbing startup
    for d in (args.small, args.big):
        QUERIES["pricing_summary"](spark, d).write.format("noop").mode("overwrite").save()

    def _run(name, d):
        spark.catalog.clearCache()
        gc.collect()
        release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
        start = time.perf_counter()
        QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    rows, errors = [], []
    for name in names:
        small_ts, big_ts = [], []
        try:
            for _ in range(max(1, args.reps)):
                small_ts.append(_run(name, args.small))
                big_ts.append(_run(name, args.big))
        except Exception as exc:  # noqa: BLE001 — a tripwire that dies on
            # the first broken query hides every later one's slope
            errors.append({"query": name, "err": f"{type(exc).__name__}: {exc}"})
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            continue
        ts, tb = min(small_ts), min(big_ts)
        e = effective_exponent(ts, tb, data_ratio)
        flagged = is_superlinear(ts, tb, data_ratio)
        rows.append({
            "query": name,
            "t_small": round(ts, 3),
            "t_big": round(tb, 3),
            "ratio": round(tb / max(ts, 1e-3), 2),
            "exponent": round(e, 2),
            "flagged": flagged,
        })
        print(f"# {name}: {ts:.2f}s -> {tb:.2f}s  e={e:.2f}"
              f"{'  ** SUPERLINEAR **' if flagged else ''}", file=sys.stderr)

    rows.sort(key=lambda r: -r["exponent"])
    record = {
        "small": args.small,
        "big": args.big,
        "data_ratio": data_ratio,
        "reps": args.reps,
        "max_exponent": MAX_EXPONENT,
        "min_big_sec": MIN_BIG_SEC,
        "rows": rows,
        "errors": errors,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scaling_last.json")
    try:
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
    except OSError:
        pass

    print(f"| query | t(sf{_sf(args.small)}) | t(sf{_sf(args.big)}) | ratio | exponent |")
    print("|---|---|---|---|---|")
    for r in rows:
        mark = " **FLAG**" if r["flagged"] else ""
        print(f"| {r['query']}{mark} | {r['t_small']}s | {r['t_big']}s "
              f"| {r['ratio']} | {r['exponent']} |")
    flagged = [r["query"] for r in rows if r["flagged"]]
    if flagged or errors:
        if flagged:
            print(f"SUPERLINEAR: {flagged}", file=sys.stderr)
        if errors:
            print(f"ERRORED: {[e['query'] for e in errors]}", file=sys.stderr)
        raise SystemExit(1)
    print(f"# all {len(rows)} queries <= e={MAX_EXPONENT} (or under "
          f"{MIN_BIG_SEC}s at sf{_sf(args.big)})", file=sys.stderr)


if __name__ == "__main__":
    main()
