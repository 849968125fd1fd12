"""Time-series operators against PLANTED ground truth (round 12).

The as-of join, resample+forward-fill, and bucketized interval join are
verified by DuckDB oracles on the fixed events table — which never
exercises the boundary cases where time-series operators actually break:
simultaneous timestamps, tolerance-edge ties, points exactly on interval
boundaries, zero-length intervals, in-bucket duplicates, and multi-bucket
gaps. This harness GENERATES corpora that plant exactly those cases and
asserts each operator against a from-first-principles Python replay.

Per seeded corpus (deterministic ``random.Random(seed)``, no wall clock):

* per-user CLICK streams with unique per-user timestamps (the operator's
  documented tie contract: tied right rows need a tiebreaker upstream, so
  the generator plants ties only as the left==right simultaneous case)
  and PURCHASE times planted in five regimes: before any click (no
  match), strictly between clicks (latest-preceding wins), EXACTLY at a
  click (simultaneous rows match — the ``>=`` ASOF convention), exactly
  ``TOL`` seconds after a click (the tolerance edge is INCLUSIVE:
  ``age <= tolerance`` keeps), and ``TOL + 1`` after (nulled).
* per-key value series with planted in-bucket duplicates (arg-max by
  event_id must win), 1..5-bucket gaps (forward fill carries the last
  observation), NULL-timestamp and NULL-value rows (excluded up front),
  and one NULL-key series (a real series of its own).
* interval/point sets planting: a point exactly at ``start`` (IN — the
  half-open contract), exactly at ``end`` (OUT), inside zero-length
  intervals (no match ever), inside two overlapping intervals (matched
  to BOTH), and at the right time under the WRONG key (no match).

Invariants (violations -> exit 1, recorded per seed):

1. ``asof_join`` == replay, with and without ``tolerance_seconds`` —
   matched timestamp, id, and value per purchase, NULLs included.
2. ``resample_ffill`` == replay — grid span, fill values, is_observed.
3. ``interval_join`` == replay pair set — and BUCKET-WIDTH INVARIANCE:
   the same corpus through two very different ``bucket_seconds`` (3600
   and 137) must produce the identical pair multiset; the bucketization
   is an execution strategy, never semantics.

    python examples/fuzz_timeseries_planted.py [--seeds 20]
                                               [--out fuzz_timeseries_last.json]

tests/test_fuzz_timeseries_planted.py runs a 3-seed slice per session.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = dt.datetime(2024, 3, 1)
TOL = 600  # seconds: the tolerance regime planted around


def _ts(sec: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=sec)


def gen_corpus(seed: int) -> dict:
    """Planted clicks/purchases/series/intervals, all integer-second."""
    rng = random.Random(seed)
    users = [f"u{i:02d}" for i in range(10)]

    clicks, purchases = [], []
    cid = pid = 0
    expected_tags = {"simultaneous": 0, "tol_edge": 0, "tol_out": 0,
                     "no_match": 0}
    for u in users:
        secs = sorted(rng.sample(range(3600, 80000), rng.randint(5, 12)))
        for s in secs:
            clicks.append((u, cid, _ts(s), round(rng.random(), 6)))
            cid += 1
        # purchase regimes (guaranteed-gap placements)
        purchases.append((u, pid, _ts(100)))  # before any click
        expected_tags["no_match"] += 1
        pid += 1
        anchor = rng.choice(secs)
        purchases.append((u, pid, _ts(anchor)))  # simultaneous
        expected_tags["simultaneous"] += 1
        pid += 1
        purchases.append((u, pid, _ts(anchor + TOL)))  # tolerance edge: kept
        expected_tags["tol_edge"] += 1
        pid += 1
        lone = max(secs)
        purchases.append((u, pid, _ts(lone + TOL + 1)))  # beyond: nulled
        expected_tags["tol_out"] += 1
        pid += 1
        for _ in range(rng.randint(1, 3)):  # generic in-between
            purchases.append((u, pid, _ts(rng.randint(3600, 90000))))
            pid += 1

    series = []
    eid = 0
    for key in users[:6] + [None]:  # one NULL-key series
        start_bucket = rng.randint(0, 5)
        b = start_bucket
        for _ in range(rng.randint(3, 8)):
            n_in_bucket = rng.choice([1, 1, 2, 3])  # planted duplicates
            for _ in range(n_in_bucket):
                sec = b * 3600 + rng.randint(0, 3599)
                series.append((key, eid, _ts(sec), round(rng.random(), 6)))
                eid += 1
            b += rng.randint(1, 5)  # gaps up to 4 empty buckets
        # excluded rows: NULL ts / NULL value
        series.append((key, eid, None, 1.0)); eid += 1
        series.append((key, eid, _ts(b * 3600), None)); eid += 1

    points, intervals = [], []
    qid = vid = 0
    for u in users[:6]:
        s0 = rng.randint(1000, 50000)
        length = rng.randint(60, 3600)
        intervals.append((u, vid, _ts(s0), _ts(s0 + length))); vid += 1
        points.append((u, qid, _ts(s0))); qid += 1          # at start: IN
        points.append((u, qid, _ts(s0 + length))); qid += 1  # at end: OUT
        points.append((u, qid, _ts(s0 + rng.randint(1, length - 1)))); qid += 1
        # zero-length interval: never matches
        z = rng.randint(60000, 70000)
        intervals.append((u, vid, _ts(z), _ts(z))); vid += 1
        points.append((u, qid, _ts(z))); qid += 1
        # overlapping pair sharing a point
        o = rng.randint(72000, 80000)
        intervals.append((u, vid, _ts(o), _ts(o + 1000))); vid += 1
        intervals.append((u, vid, _ts(o + 500), _ts(o + 1500))); vid += 1
        points.append((u, qid, _ts(o + 700))); qid += 1  # inside BOTH
        # wrong-key probe: another user's point at the same instant
        points.append((users[7], qid, _ts(o + 700))); qid += 1

    return {"clicks": clicks, "purchases": purchases, "series": series,
            "points": points, "intervals": intervals,
            "expected_tags": expected_tags}


def asof_replay(purchases, clicks, tolerance=None) -> dict:
    """purchase_id -> (click_ts, click_id, value) or (None, None, None)."""
    by_user: dict = {}
    for u, cid, ts, val in clicks:
        by_user.setdefault(u, []).append((ts, cid, val))
    out = {}
    for u, pid, pts in purchases:
        cands = [c for c in by_user.get(u, []) if c[0] <= pts]
        if not cands:
            out[pid] = (None, None, None)
            continue
        ts, cid, val = max(cands)  # unique per-user ts by construction
        if tolerance is not None and (pts - ts).total_seconds() > tolerance:
            out[pid] = (None, None, None)
        else:
            out[pid] = (ts, cid, val)
    return out


def resample_replay(series) -> list:
    """Sorted [(key, bucket, value, is_observed)] under the operator's
    contract (hour buckets, arg-max by event_id, ffill, NULLs excluded)."""
    per_key: dict = {}
    for key, eid, ts, val in series:
        if ts is None or val is None:
            continue
        bucket = ts.replace(minute=0, second=0, microsecond=0)
        cur = per_key.setdefault(key, {})
        if bucket not in cur or eid > cur[bucket][0]:
            cur[bucket] = (eid, val)
    rows = []
    for key, buckets in per_key.items():
        b = min(buckets)
        last_val = None
        while b <= max(buckets):
            if b in buckets:
                last_val = buckets[b][1]
                rows.append((key, b, last_val, True))
            else:
                rows.append((key, b, last_val, False))
            b += dt.timedelta(hours=1)
    return sorted(rows, key=lambda r: (str(r[0]), r[1]))


def interval_replay(points, intervals) -> set:
    return {
        (u, qid, vid)
        for u, qid, t in points
        for iu, vid, s, e in intervals
        if u == iu and s <= t < e
    }


def check_corpus(spark, seed: int) -> dict:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.asof import (
        asof_join,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.interval import (
        interval_join,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.timeseries import (
        resample_ffill,
    )

    corpus = gen_corpus(seed)
    violations: list[str] = []

    clicks = spark.createDataFrame(
        corpus["clicks"], "user_id string, click_id long, ts timestamp, value double"
    ).repartition(8)
    purchases = spark.createDataFrame(
        corpus["purchases"], "user_id string, purchase_id long, ts timestamp"
    ).repartition(8)

    for tol in (None, TOL):
        got = {
            r["purchase_id"]: (r["ts_right"], r["click_id_right"], r["value_right"])
            for r in asof_join(
                purchases, clicks, on="user_id",
                right_cols=("click_id", "value"), tolerance_seconds=tol,
            ).collect()
        }
        want = asof_replay(corpus["purchases"], corpus["clicks"], tolerance=tol)
        if set(got) != set(want):
            violations.append(f"asof(tol={tol}): purchase-id set mismatch")
        else:
            bad = {p: (got[p], want[p]) for p in want if got[p] != want[p]}
            if bad:
                sample = dict(list(bad.items())[:3])
                violations.append(f"asof(tol={tol}): {len(bad)} mismatches, e.g. {sample}")

    series = spark.createDataFrame(
        corpus["series"], "user_id string, event_id long, ts timestamp, value double"
    ).repartition(8)
    got_rs = sorted(
        ((r["user_id"], r["bucket"], r["value"], r["is_observed"])
         for r in resample_ffill(series, unit="hour").collect()),
        key=lambda r: (str(r[0]), r[1]),
    )
    want_rs = resample_replay(corpus["series"])
    if got_rs != want_rs:
        diffs = [(a, b) for a, b in zip(got_rs, want_rs) if a != b][:3]
        violations.append(
            f"resample: {len(got_rs)} vs {len(want_rs)} rows, first diffs {diffs}")

    points = spark.createDataFrame(
        corpus["points"], "user_id string, point_id long, ts timestamp"
    ).repartition(8)
    ivs = spark.createDataFrame(
        corpus["intervals"],
        "user_id string, interval_id long, start_ts timestamp, end_ts timestamp",
    ).repartition(8)
    want_iv = interval_replay(corpus["points"], corpus["intervals"])
    pair_sets = {}
    for width in (3600, 137):
        rows = interval_join(
            points, ivs, bucket_seconds=width, point_time="ts", on="user_id"
        ).select("user_id", "point_id", "interval_id").collect()
        pairs = [(r["user_id"], r["point_id"], r["interval_id"]) for r in rows]
        if len(pairs) != len(set(pairs)):
            violations.append(f"interval(width={width}): duplicate pairs emitted")
        pair_sets[width] = set(pairs)
        if pair_sets[width] != want_iv:
            violations.append(
                f"interval(width={width}): missing "
                f"{sorted(want_iv - pair_sets[width])[:3]}, extra "
                f"{sorted(pair_sets[width] - want_iv)[:3]}")
    if pair_sets[3600] != pair_sets[137]:
        violations.append("interval: result depends on bucket width")

    return {
        "seed": seed,
        "n_clicks": len(corpus["clicks"]),
        "n_purchases": len(corpus["purchases"]),
        "n_series_rows": len(corpus["series"]),
        "n_interval_pairs": len(want_iv),
        "planted_regimes": corpus["expected_tags"],
        "violations": violations,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_timeseries_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-timeseries", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} (pairs={rec['n_interval_pairs']})",
              file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "interval_pairs_total": sum(r["n_interval_pairs"] for r in records),
        "failing_seeds": [r["seed"] for r in bad],
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "records": records}, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
