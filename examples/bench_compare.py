"""Rep-aware bench diff: separate real regressions from session noise.

Compares the current ``bench_last.json`` (which carries per-rep arrays as
of round 6) against a prior round's ``BENCH_r{N}.json`` and classifies
each common query:

  * ``ok``        — within ``--threshold`` (default 1.5x) of the old best.
  * ``noisy``     — slower than threshold, BUT the rep array's spread
                    (max/min) exceeds ``--spread`` (default 1.5): the
                    session itself was unstable around this query, so the
                    number indicts the box, not the code. r5's four
                    phantom 3-6x "regressions" were exactly this class.
  * ``regressed`` — slower than threshold with a TIGHT rep spread: three
                    consistent reps all slow is real evidence. Probe it.

This encodes the standing measurement discipline (SCALE.md "Driver
policy"): best-of-N defends against noise WITHIN a rep set; only spread
can flag noise ACROSS the session; and only an interleaved same-session
probe settles a flagged query.

    python examples/bench_compare.py BENCH_r05.json [--threshold 1.5]
                                                    [--spread 1.5]

Exits non-zero only on ``regressed`` rows.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def classify(old: float, best: float, reps, threshold: float, spread: float,
             floor: float) -> str:
    if best <= old * threshold or best <= floor:
        # sub-floor timings are session overhead; their ratios aren't
        # evidence (the scaling guard's MIN_BIG_SEC lesson)
        return "ok"
    if reps and min(reps) > 0 and (max(reps) / min(reps)) > spread:
        return "noisy"
    return "regressed"


def load_old(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # BENCH_r{N}.json wraps the parsed stdout line; bench_last.json is flat
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", help="prior BENCH_r{N}.json (or bench_last.json)")
    ap.add_argument("--new", default=os.path.join(_REPO, "bench_last.json"))
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--spread", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.75,
                    help="best times under this are overhead, never regressed")
    args = ap.parse_args()

    old_q = load_old(args.old)
    with open(args.new) as f:
        new = json.load(f)
    new_q, reps = new["queries"], new.get("reps", {})

    rows = []
    for name in sorted(set(old_q) & set(new_q)):
        cls = classify(old_q[name], new_q[name], reps.get(name), args.threshold,
                       args.spread, args.floor)
        rows.append((cls, name, old_q[name], new_q[name], reps.get(name)))

    order = {"regressed": 0, "noisy": 1, "ok": 2}
    rows.sort(key=lambda r: (order[r[0]], -(r[3] / max(r[2], 1e-3))))
    n = {"ok": 0, "noisy": 0, "regressed": 0}
    for cls, name, old, best, rep in rows:
        n[cls] += 1
        if cls != "ok":
            print(f"{cls.upper():9s} {name:35s} {old:6.2f}s -> {best:6.2f}s"
                  f"  reps={rep}")
    tot_old = sum(r[2] for r in rows)
    tot_new = sum(r[3] for r in rows)
    print(f"# {len(rows)} common queries: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"(ratio {tot_new / tot_old:.2f}); "
          f"{n['ok']} ok, {n['noisy']} noisy, {n['regressed']} regressed")
    if n["regressed"]:
        print("# probe regressed queries interleaved before believing them "
              "(SCALE.md driver policy)", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
