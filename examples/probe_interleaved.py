"""Interleaved same-session probe for flagged bench queries.

The SCALE.md driver policy: best-of-N defends against noise within a rep
set, the rep-spread flags session-wide noise, but only an INTERLEAVED
same-session probe settles whether a flagged query is genuinely slower —
round-robin reps spread each query's samples across the session's noise
profile instead of letting one noisy minute own all of a query's reps.

    python examples/probe_interleaved.py q1 q2 ... [--rounds 6]

Prints per-query rep arrays (in interleave order), min, and the ratio vs
any reference times passed as name=sec pairs via --ref.

``--accept name [name ...]`` additionally records the named probed queries
into ``BENCH_ADJUDICATIONS.json`` (SCALE.md bench-adjudication policy):
each gets ``accepted_best`` = this probe's min, the rep array as evidence,
and ``--note``/``--round-tag`` metadata — the one-command path from "probe
settled it, slowdown accepted" to the artifact ``bench_compare --baseline``
reads. Queries not listed are never recorded; use it only for verdicts of
"accepted" (fixes need no entry, noise goes in SCALE.md's table).

Accepting requires CONTROL EVIDENCE in the same probe (ADVICE r8): a probe
that shows only the flagged query slow proves nothing about the box — a
control query whose all-rounds best is known must ride the same interleave
and land near its best, or the "slow" verdict indicts the session, not the
code. So ``--accept`` demands (a) at least one ``--ref`` entry for a probed
query OTHER than the accepted ones (that query becomes the recorded
control, with its measured ratio), (b) ``--round-tag >= 1`` (entries
stamped round 0 are indistinguishable from careless re-runs), and (c)
``--force`` to overwrite an existing entry — the prior entry is preserved
under the new entry's ``history`` so the audit trail survives. The
recording is then GATED on the control actually reproducing: any control
ratio above 1.2x its ``--ref`` best refuses the write (exit 3) — a noisy
session cannot re-baseline the creep guard no matter what the caller
typed. The book is re-read immediately before writing so a concurrent
probe's entries are never clobbered by this run's pre-probe snapshot.
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--ref", nargs="*", default=[],
                    help="name=sec reference bests to ratio against")
    ap.add_argument("--accept", nargs="*", default=[],
                    help="probed queries to record as ACCEPTED slowdowns in "
                         "BENCH_ADJUDICATIONS.json (accepted_best = probe min)")
    ap.add_argument("--note", default="",
                    help="why the slowdown is accepted (stored per entry)")
    ap.add_argument("--round-tag", type=int, default=0,
                    help="round number stamped on recorded entries")
    ap.add_argument("--force", action="store_true",
                    help="allow --accept to replace an existing adjudication "
                         "entry (the prior entry is kept under 'history')")
    args = ap.parse_args()
    unknown_accept = [n for n in args.accept if n not in args.names]
    if unknown_accept:
        ap.error(f"--accept names must be probed too: {unknown_accept}")
    # rpartition, not split: a malformed entry gets a clear argparse error
    # instead of an IndexError, and a (hypothetical) query name containing
    # '=' still parses — only the LAST '=' separates name from seconds
    parsed_refs = []
    for kv in args.ref:
        name, sep, val = kv.rpartition("=")
        if not sep or not name or not val:
            ap.error(f"--ref expects name=sec, got {kv!r}")
        try:
            best = float(val)
        except ValueError:
            ap.error(f"--ref seconds must be numeric, got {kv!r}")
        if best <= 0:
            ap.error(f"--ref best must be > 0: {kv}")
        parsed_refs.append((name, best))
    control_names = []
    if args.accept:
        if args.round_tag < 1:
            ap.error("--accept requires --round-tag >= 1 (round-0 entries "
                     "are indistinguishable from careless re-runs)")
        ref_names = {n for n, _ in parsed_refs}
        control_names = sorted(
            (ref_names & set(args.names)) - set(args.accept))
        if not control_names:
            ap.error("--accept requires control evidence: probe at least one "
                     "NON-accepted query with a --ref name=sec best in the "
                     "same interleave (SCALE.md: a slowdown is only 'accepted'"
                     " when a control reproduced near its best alongside it)")
    adjudications_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ADJUDICATIONS.json",
    )
    book = {}
    if os.path.exists(adjudications_path):
        with open(adjudications_path) as f:
            book = json.load(f)
    # refuse BEFORE the probe runs — a careless re-run must not burn minutes
    # of reps only to clobber (or fail to write) the audit trail at the end
    blocked = [n for n in args.accept if n in book and not args.force]
    if blocked:
        ap.error(f"adjudication entries already exist for {blocked} — pass "
                 f"--force to replace (prior entries are preserved under "
                 f"'history')")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    refs = {}
    for k, v in parsed_refs:
        refs.setdefault(k, []).append(v)

    spark = get_spark(app_name="vlds-probe")
    # warmup EVERY probed query outside the timed loop — warming only one
    # would leave the others' first rep carrying plan compilation and scan
    # cold-start, biasing exactly the drift verdict this tool exists to
    # settle (a flagged query would read as confirmed-slow on warmup noise)
    for name in args.names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    reps: dict = {n: [] for n in args.names}
    for _ in range(args.rounds):
        for name in args.names:  # interleave: one rep of each per round
            spark.catalog.clearCache()
            gc.collect()
            release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.perf_counter() - t0, 3))

    out = {}
    for name, arr in reps.items():
        row = {"reps": arr, "min": min(arr),
               "spread": round(max(arr) / min(arr), 2)}
        for i, r in enumerate(refs.get(name, [])):
            row[f"ratio_vs_ref{i}"] = round(min(arr) / r, 2)
        out[name] = row
        print(f"# {name}: min={row['min']}s spread={row['spread']} reps={arr}",
              file=sys.stderr)
    print(json.dumps(out))

    if args.accept:
        # the control's evidence: its measured min and the ratio vs the best
        # the caller passed — bench_compare rejects entries without this
        controls = {
            n: {"min": out[n]["min"],
                "ratio_vs_best": round(out[n]["min"] / min(refs[n]), 2)}
            for n in control_names
        }
        # the control must actually REPRODUCE near its best (SCALE.md:
        # <= ~1.2x), or this probe indicts the session and recording an
        # acceptance would re-baseline the creep guard on noise — the
        # exact failure the ritual exists to prevent
        bad = {n: c["ratio_vs_best"] for n, c in controls.items()
               if c["ratio_vs_best"] > 1.2}
        if bad:
            print(f"# REFUSED to record: control(s) did not reproduce "
                  f"their bests {bad} (need <= 1.2x) — noisy session, "
                  f"re-probe on a quiet box", file=sys.stderr)
            raise SystemExit(3)
        # re-read the book NOW: the probe ran for minutes and another
        # probe/process may have recorded entries since the fail-fast
        # snapshot — writing that stale snapshot back would silently drop
        # them from the audit trail
        book = {}
        if os.path.exists(adjudications_path):
            with open(adjudications_path) as f:
                book = json.load(f)
        still_blocked = [n for n in args.accept
                         if n in book and not args.force]
        if still_blocked:
            print(f"# REFUSED: entries for {still_blocked} appeared while "
                  f"the probe ran — pass --force to replace",
                  file=sys.stderr)
            raise SystemExit(1)
        for name in args.accept:
            prior = book.get(name)
            book[name] = {
                "round": args.round_tag,
                "verdict": "accepted",
                "note": args.note,
                "accepted_best": out[name]["min"],
                "probe_reps": out[name]["reps"],
                "control": controls,
            }
            if prior is not None:
                book[name]["history"] = (
                    prior.pop("history", []) + [prior])
        with open(adjudications_path, "w") as f:
            json.dump(book, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"# recorded {len(args.accept)} adjudication(s) -> "
              f"{adjudications_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
