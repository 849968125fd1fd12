"""Rep-aware bench diff: separate real regressions from session noise.

Compares the current ``bench_last.json`` (which carries per-rep arrays as
of round 6) against a prior round's ``BENCH_r{N}.json`` — or, with
``--baseline``, against the per-query BEST across ALL recorded rounds —
and classifies each common query:

  * ``ok``        — within ``--threshold`` (default 1.5x) of the old best.
  * ``noisy``     — slower than threshold, BUT the new rep array's spread
                    (max/min) exceeds what this query's own history says
                    is normal: the session was abnormally unstable around
                    this query, so the number indicts the box, not the
                    code. r5's four phantom 3-6x "regressions" were
                    exactly this class. Noisy-and-slow rows SOFT-FAIL
                    (exit 2) — they are unresolved, not passed.
  * ``regressed`` — slower than threshold with a spread consistent with
                    this query's history: N consistent reps all slow is
                    real evidence. Probe it (exit 1).

The noisy/regressed split is calibrated PER QUERY when the comparison
target carries rep arrays: a query whose baseline spread is already 2.0x
is inherently jittery, and a new run with spread 2.1x is normal for it —
only a spread materially above its own baseline (>1.25x the baseline
spread, and above ``--spread``) excuses a slow best-of-N. Without
baseline reps the flat ``--spread`` threshold applies (the pre-r7
behavior). This closes the blind spot where inherently jittery queries
could never be flagged regressed.

``--baseline`` mode guards against slow CREEP: a code path that loses
<1.5x per round is invisible to the single-round diff but compounds
across rounds. It scans every BENCH_r*.json (recovering query times from
truncated stdout tails where the driver's capture clipped the JSON line,
e.g. BENCH_r04), takes the per-query minimum as the all-rounds best, and
classifies against that. A ``regressed`` row here means the current code
is ≥threshold slower than the best this box has EVER run the query.

This encodes the standing measurement discipline (SCALE.md "Driver
policy"): best-of-N defends against noise WITHIN a rep set; only spread
can flag noise ACROSS the session; and only an interleaved same-session
probe settles a flagged query.

``--baseline`` mode additionally consults ``BENCH_ADJUDICATIONS.json``
(round-7 VERDICT item 4): a regressed/noisy flag whose query carries a
recorded interleaved-probe adjudication — with a reproducing control and
an ``accepted_best`` — is reclassified ``adjudicated`` (clean exit) as
long as the current best stays within ``--threshold`` of the accepted
level. More than ``--threshold`` beyond even the accepted level and the
row is ``regressed`` again: adjudication re-baselines (the creep guard
now measures drift from ``accepted_best`` instead of the all-rounds
best), it does not grant immunity. Entries without recorded control
evidence (a non-accepted probed query with a ``ratio_vs_best``) or with
a verdict other than ``accepted`` are IGNORED with a warning — an
adjudication that skipped the control ritual is not evidence
(probe_interleaved --accept refuses to write such entries). The
comparator therefore exits non-zero until every flag has either a fix or
a recorded adjudication — the round-7 gap (guard fired, round closed with
the flags unadjudicated) cannot recur silently.

Since round 12 ``--baseline`` is additionally CAL-NORMALIZED (VERDICT r11
item 1): bench.py records two fixed-cost box-speed probes per session
("agg" = columnar scan+aggregate, "alloc" = string/allocation/GC — the r11
interleaved probes showed the two regimes drift independently on this
box). Each query belongs to one regime (``REGIME``); its all-rounds best
is rescaled by this session's regime factor (session cal / best historical
cal, clamped to [1, CAL_FACTOR_CAP], current round excluded from the
history per ADVICE r11) before the threshold applies. A query slow against
its raw best but within the regime-adjusted level is class ``box`` —
measured environment drift, clean exit, printed with the factor so the
attribution is a number, not prose. Beyond the adjusted level the row is a
plan question exactly as before. ``accepted_best`` adjudication levels are
regime-scaled the same way.

    python examples/bench_compare.py BENCH_r05.json [--threshold 1.5]
                                                    [--spread 1.5]
    python examples/bench_compare.py --baseline

Exit codes: 1 = regressed rows, 2 = noisy-and-slow rows only, 0 = clean.
"""

import argparse
import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A new spread only excuses a slow best when it exceeds the query's own
# baseline spread by this factor (ADVICE r6: a fixed threshold left 22/69
# inherently-jittery queries permanently unflaggable).
SPREAD_EXCESS = 1.25

# Regime factors above this cap stop widening the gate: a box claiming to be
# >3x slower than its best round is a broken session, not a gate excuse —
# real regressions must not hide behind a melting box.
CAL_FACTOR_CAP = 3.0

# Box-speed regime per headline query (VERDICT r11 item 1): "agg" tracks the
# columnar scan + numeric aggregate/join/window calibration probe; "alloc"
# tracks the string/array allocation probe (tokenization, explode, HOFs,
# md5/regex, Arrow pandas UDFs). Assignment follows the r11 interleaved-probe
# evidence: pricing_summary-shaped plans reproduced their bests while every
# alloc-heavy shape drifted together 1.3-1.8x. Queries absent here (or with
# no factor computed) gate with the CONSERVATIVE factor — min across regimes
# — so an unmapped query never gets the wider excuse.
# tests/test_bench_compare.py pins this map to bench.py's HEADLINE list.
REGIME = {
    "pricing_summary": "agg",
    "shipping_priority_q3": "agg",
    "local_supplier_volume_q5": "agg",
    "returned_item_customers_q10": "agg",
    "top_revenue_orders": "agg",
    "late_shipment_counts": "agg",
    "top2_orders_per_customer": "agg",
    "customer_running_spend": "agg",
    "events_sessionization": "agg",
    "events_tumbling_10min": "agg",
    "events_resample_1h_ffill": "agg",
    "events_trailing_24h_stats": "agg",
    "events_sliding_10m_5m": "agg",
    "events_click_in_purchase_window": "agg",
    "purchase_click_attribution": "agg",
    "order_priority_exists_late": "agg",
    "q9_product_profit": "agg",
    "q13_customer_distribution": "agg",
    "q21_latest_shipper": "agg",
    "doc_length_iqr_outliers": "agg",
    "doc_bloom_skip_existing": "agg",
    "doc_stats_by_lang": "alloc",
    "doc_chunk_fixed100": "alloc",
    "doc_exact_dedup": "alloc",
    "doc_span_dedup": "alloc",
    "ngram_jaccard_top20": "alloc",
    "minhash_lsh_dedup": "alloc",
    "rouge1_per_doc": "alloc",
    "embedding_knn_top3": "alloc",
    "embedding_ann_lsh_top3": "alloc",
    "simhash_near_dups": "alloc",
    "pipeline_truncated_mock": "alloc",
    "pipeline_mapreduce_mock": "alloc",
    "pipeline_iterative_mock": "alloc",
    "pipeline_critique_mock": "alloc",
    "pipeline_hierarchical_mock": "alloc",
    "bertscore_mock_pairs": "alloc",
    "bpe_token_counts": "alloc",
    "doc_winnow_fingerprints": "alloc",
    "doc_winnow_fast": "alloc",
    "ann_recall_at3": "alloc",
    "multimodal_decode_features": "alloc",
    "doc_dup_clusters": "alloc",
    "doc_contamination_top20": "alloc",
    "corpus_pack_512": "alloc",
    "corpus_pack_greedy_512": "alloc",
    "doc_split_assign": "alloc",
    "doc_repetition_stats": "alloc",
    "doc_pii_redact": "alloc",
    "bm25_search_top10": "alloc",
    "corpus_top_bigrams": "alloc",
    "doc_epoch_upsample": "alloc",
    "doc_char_entropy": "alloc",
    "doc_tfidf_top3": "alloc",
    "doc_unigram_logprob": "alloc",
    "doc_feature_hash_embed": "alloc",
    "doc_quality_report": "alloc",
    "doc_source_quota": "alloc",
    "embedding_split_contamination": "alloc",
    "embedding_semantic_dedup": "alloc",
    "doc_line_dedup": "alloc",
    "minhash_md5_star_dedup": "alloc",
    "minhash_md5_incremental_dedup": "alloc",
    "hybrid_search_top10": "alloc",
    "doc_text_normalize": "alloc",
    "media_ahash_near_dups": "alloc",
    "doc_compression_ratio": "alloc",
    "minhash_star_fast": "alloc",
    "minhash_incremental_fast": "alloc",
}


def spread_of(reps) -> float:
    if reps and min(reps) > 0:
        return max(reps) / min(reps)
    return 1.0


def classify(old: float, best: float, reps, threshold: float, spread: float,
             floor: float, base_spread: float | None = None) -> str:
    if best <= old * threshold or best <= floor:
        # sub-floor timings are session overhead; their ratios aren't
        # evidence (the scaling guard's MIN_BIG_SEC lesson)
        return "ok"
    new_spread = spread_of(reps)
    if base_spread is not None:
        # per-query calibration: jitter is only an excuse when it exceeds
        # the query's own demonstrated jitter
        noisy = new_spread > max(spread, base_spread * SPREAD_EXCESS)
    else:
        noisy = new_spread > spread
    return "noisy" if noisy else "regressed"


def _recover_from_tail(tail: str) -> dict:
    """Best-effort query times from a truncated bench stdout line (the
    driver clipped BENCH_r04's JSON mid-object). Grabs every
    '"name": <number>' pair after the queries key; the handful of
    non-query scalar keys are filtered by name."""
    m = re.search(r'"queries"\s*:\s*\{', tail)
    frag = tail[m.end():] if m else tail
    out = {}
    # the value must be FOLLOWED by a pair terminator (',' or '}') — a clip
    # mid-number ('"q": 1.9' cut to '"q": 1.') would otherwise record an
    # artificially low time that poisons the all-rounds best forever
    for name, val in re.findall(
        r'"([A-Za-z0-9_]+)"\s*:\s*([0-9]+\.?[0-9]*)\s*[,}]', frag
    ):
        if name in ("value", "sf", "metric"):
            continue
        out[name] = float(val)
    return out


def load_old(path: str) -> tuple[dict, dict]:
    """(query->best, query->reps) from a BENCH_r{N}.json or bench_last.json."""
    with open(path) as f:
        d = json.load(f)
    # BENCH_r{N}.json wraps the parsed stdout line; bench_last.json is flat
    if "parsed" in d:
        if d["parsed"] is None:
            return _recover_from_tail(d.get("tail") or ""), {}
        d = d["parsed"]
    return d["queries"], d.get("reps", {})


def load_baseline() -> tuple[dict, dict]:
    """Per-query best (and the max spread the box has shown for it) across
    every recorded round's BENCH file."""
    best: dict = {}
    spreads: dict = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json"))):
        q, reps = load_old(path)
        for name, t in q.items():
            if name not in best or t < best[name]:
                best[name] = t
        for name, rep in reps.items():
            spreads[name] = max(spreads.get(name, 1.0), spread_of(rep))
    return best, spreads


def _cal_dict(raw) -> dict:
    """Normalize a "cal" value to {regime: sec}: since r11 it is
    {"agg": ..., "alloc": ...} (two box regimes — the r11 probes showed
    columnar scan+agg and allocation/GC speed drift independently)."""
    if isinstance(raw, (int, float)):
        return {"agg": float(raw)}
    if isinstance(raw, dict):
        return {k: float(v) for k, v in raw.items()
                if isinstance(v, (int, float))}
    return {}


def load_calibrations(exclude_path: str | None = None,
                      exclude_run: dict | None = None) -> dict:
    """round-file -> {regime: calibration seconds} ("cal" key, bench.py's
    fixed-cost box-speed probes, recorded since r11). Earlier rounds have
    none.

    Exclusion identifies the round being COMPARED so its own cal never
    enters the historical min (ADVICE r11: a committed copy of the session
    under comparison would pin the box factor to 1.0, comparing the session
    against itself) — by FILENAME (``exclude_path``: the --new file itself
    may be a BENCH_r{N}.json) or by RUN IDENTITY (``exclude_run``: a
    history file whose per-query timing dict AND cal both equal the new
    run's is a verbatim copy of it). ADVICE r12 dropped the old
    cal-value-equality heuristic: committed cals are rounded to 3 decimals,
    so two distinct sessions on a stable box can collide on cal alone and a
    genuine historical round would be silently dropped; also colliding on
    the full ms-resolution query timing dict cannot happen."""
    exclude_base = os.path.basename(exclude_path) if exclude_path else None
    cals = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json"))):
        if exclude_base and os.path.basename(path) == exclude_base:
            continue
        with open(path) as f:
            d = json.load(f)
        if "parsed" in d:
            d = d["parsed"] or {}
        if (exclude_run
                and d.get("queries") == exclude_run.get("queries")
                and d.get("cal") == exclude_run.get("cal")):
            continue
        c = _cal_dict(d.get("cal"))
        if c:
            cals[os.path.basename(path)] = c
    return cals


def session_cal(new: dict) -> dict:
    """The CONSERVATIVE box-speed figure for the session under comparison
    (VERDICT r12 finding 1): when the run recorded per-phase probe reps
    (``cal_reps.start/end``), gate on the WORSE of the two phase minima per
    regime — a load spike that hit the early queries and passed before the
    end-of-run probe must still widen the gate. Falls back to the flat
    ``cal`` scalar/dict for records without phase detail (driver artifacts
    strip ``cal_reps``; bench.py's own ``cal`` is now already the
    conservative max, so both paths agree on new records)."""
    phases = new.get("cal_reps")
    if isinstance(phases, dict):
        start = {k: min(v) for k, v in (phases.get("start") or {}).items()
                 if isinstance(v, list) and v}
        end = {k: min(v) for k, v in (phases.get("end") or {}).items()
               if isinstance(v, list) and v}
        if start or end:
            return {k: max(start.get(k, 0.0), end.get(k, 0.0))
                    for k in set(start) | set(end)}
    return _cal_dict(new.get("cal"))


def session_cal_phases(new: dict) -> dict:
    """Which probe phase (start/end) produced each regime's gating value —
    the companion attribution to ``session_cal`` so a reader can see
    whether the widened gate came from a spike the EARLY queries saw
    (start) or a late one (end). 'equal' when the phases tie; 'flat' for
    records without phase detail."""
    phases = new.get("cal_reps")
    out: dict = {}
    if isinstance(phases, dict):
        start = {k: min(v) for k, v in (phases.get("start") or {}).items()
                 if isinstance(v, list) and v}
        end = {k: min(v) for k, v in (phases.get("end") or {}).items()
               if isinstance(v, list) and v}
        for k in set(start) | set(end):
            s, e = start.get(k), end.get(k)
            if s is None or (e is not None and e > s):
                out[k] = "end"
            elif e is None or s > e:
                out[k] = "start"
            else:
                out[k] = "equal"
    return out


def _round_number(filename: str) -> int:
    """Numeric round of a BENCH_r{N}.json name; -1 when unparseable. Sorting
    by this (not the raw filename) keeps the 'vs latest round' attribution
    correct past round 99 (ADVICE r12: BENCH_r100 sorts before BENCH_r99
    lexicographically)."""
    m = re.search(r"_r(\d+)", filename)
    return int(m.group(1)) if m else -1


def regime_factors(new_cal: dict, cals: dict,
                   phases: dict | None = None) -> tuple[dict, list]:
    """Per-regime box factor for the gate, plus human-readable attribution.

    factor[regime] = this session's cal / the best (min) historical cal for
    that regime, clamped to [1, CAL_FACTOR_CAP]: a faster-than-ever box
    never WIDENS the gate (the raw classify stays the floor), and a >cap
    box is a broken session that must not hide real regressions. The
    attribution lines report the RAW ratio vs the all-rounds best and vs
    the most recent prior round — the measured line VERDICT r11 item 1
    requires in place of adjudication prose."""
    factors, attribution = {}, []
    for regime, sec in sorted(new_cal.items()):
        hist = {f: c[regime] for f, c in cals.items() if regime in c}
        if not hist or min(hist.values()) <= 0:
            continue
        raw = sec / min(hist.values())
        factors[regime] = min(max(raw, 1.0), CAL_FACTOR_CAP)
        latest = max(hist, key=_round_number)  # numeric round, not lexicographic
        n = _round_number(latest)
        label = f"r{n}" if n >= 0 else latest
        phase = (phases or {}).get(regime)
        phase_note = f", gated by {phase} phase" if phase else ""
        attribution.append(
            f"{regime} regime x{raw:.2f} vs all-rounds best, "
            f"x{sec / hist[latest]:.2f} vs {label}{phase_note}"
        )
    return factors, attribution


def load_adjudications() -> dict:
    """query -> VALID adjudication record from BENCH_ADJUDICATIONS.json.

    Each record carries the probe evidence ({"round", "verdict", "note",
    "accepted_best", "probe_reps", "control"}). Records are only honored
    when the SCALE.md ritual is complete (ADVICE r8): ``verdict`` must be
    ``accepted``, ``accepted_best`` present, and ``control`` must name at
    least one control query with its measured ``ratio_vs_best`` — a probe
    with no control reproducing near its best proves nothing about the
    box. Invalid entries are dropped with a warning so a hand-edited or
    legacy entry can't silently weaken the creep guard."""
    path = os.path.join(_REPO, "BENCH_ADJUDICATIONS.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        book = json.load(f)
    valid = {}
    for name, rec in book.items():
        control = rec.get("control") or {}
        complete = (
            rec.get("verdict") == "accepted"
            and rec.get("accepted_best") is not None
            and any("ratio_vs_best" in c for c in control.values()
                    if isinstance(c, dict))
        )
        if complete:
            valid[name] = rec
        else:
            print(f"# WARNING: ignoring adjudication for {name!r} — "
                  f"verdict={rec.get('verdict')!r}, control evidence "
                  f"{'present' if control else 'MISSING'}; re-record via "
                  f"probe_interleaved --accept with a --ref control",
                  file=sys.stderr)
    return valid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?",
                    help="prior BENCH_r{N}.json (or bench_last.json)")
    ap.add_argument("--baseline", action="store_true",
                    help="compare against the per-query best across ALL "
                         "BENCH_r*.json (cumulative-creep guard)")
    ap.add_argument("--new", default=os.path.join(_REPO, "bench_last.json"))
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--spread", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.75,
                    help="best times under this are overhead, never regressed")
    args = ap.parse_args()
    if bool(args.old) == bool(args.baseline):
        ap.error("pass exactly one of: a prior BENCH file, or --baseline")

    if args.baseline:
        old_q, old_spreads = load_baseline()
        label = "all-rounds best"
    else:
        old_q, old_reps = load_old(args.old)
        old_spreads = {n: spread_of(r) for n, r in old_reps.items()}
        label = args.old
    with open(args.new) as f:
        new = json.load(f)
    new_q, reps = new["queries"], new.get("reps", {})

    # Cal-normalized regime gate (VERDICT r11 item 1), --baseline only: the
    # per-regime box factor rescales each query's all-rounds best before the
    # threshold applies. A query slower than threshold x its RAW best but
    # within threshold x its regime-adjusted best is class "box" — measured
    # environment drift, clean exit. Beyond the adjusted level it is a plan
    # question exactly as before.
    new_cal = session_cal(new)  # conservative worse-of-start/end (VERDICT r12)
    attribution: list = []
    all_factors: dict = {}
    if new_cal:  # attribution is printed in BOTH modes (it describes the box)
        all_factors, attribution = regime_factors(
            new_cal, load_calibrations(exclude_path=args.new,
                                       exclude_run=new),
            phases=session_cal_phases(new))
    # ... but the GATE only rescales in --baseline mode: a single-round diff
    # stays a strict like-for-like comparison
    factors = all_factors if args.baseline else {}

    def gate_factor(name: str) -> float:
        regime = REGIME.get(name)
        if regime is not None:
            # a query whose OWN regime has no measured factor gates at 1.0 —
            # never another regime's (possibly wider) drift
            return factors.get(regime, 1.0)
        # unmapped query: the conservative (smallest) measured factor
        return min(factors.values(), default=1.0)

    adjudications = load_adjudications() if args.baseline else {}
    rows = []
    for name in sorted(set(old_q) & set(new_q)):
        cls = classify(old_q[name], new_q[name], reps.get(name), args.threshold,
                       args.spread, args.floor, old_spreads.get(name))
        f = gate_factor(name)
        if cls != "ok" and f > 1.0 and classify(
                old_q[name] * f, new_q[name], reps.get(name), args.threshold,
                args.spread, args.floor, old_spreads.get(name)) == "ok":
            cls = "box"
        if cls in ("noisy", "regressed") and name in adjudications:
            # adjudication re-baselines at accepted_best, itself regime-
            # scaled (VERDICT r11 item 1c): an accepted level recorded in a
            # faster box regime is compared in today's regime units
            accepted = adjudications[name].get("accepted_best")
            if accepted is not None and new_q[name] <= accepted * f * args.threshold:
                cls = "adjudicated"
        rows.append((cls, name, old_q[name], new_q[name], reps.get(name)))
    if not rows:
        print(
            f"# no common queries between {label} ({len(old_q)} entries) and "
            f"{args.new} ({len(new_q)} entries) — nothing to compare",
            file=sys.stderr,
        )
        raise SystemExit(1)

    order = {"regressed": 0, "noisy": 1, "box": 2, "adjudicated": 3, "ok": 4}
    rows.sort(key=lambda r: (order[r[0]], -(r[3] / max(r[2], 1e-3))))
    n = {"ok": 0, "noisy": 0, "regressed": 0, "adjudicated": 0, "box": 0}
    for cls, name, old, best, rep in rows:
        n[cls] += 1
        if cls == "adjudicated":
            adj = adjudications[name]
            print(f"{cls.upper():11s} {name:35s} {old:6.2f}s -> {best:6.2f}s"
                  f"  accepted_best={adj.get('accepted_best')} "
                  f"(r{adj.get('round')}: {adj.get('note', '')[:60]})")
        elif cls == "box":
            print(f"{cls.upper():11s} {name:35s} {old:6.2f}s -> {best:6.2f}s"
                  f"  within {REGIME.get(name, '(unmapped)')} cal drift "
                  f"x{gate_factor(name):.2f}")
        elif cls != "ok":
            print(f"{cls.upper():11s} {name:35s} {old:6.2f}s -> {best:6.2f}s"
                  f"  reps={rep}  base_spread={old_spreads.get(name)}"
                  f"  regime_factor=x{gate_factor(name):.2f}")
    tot_old = sum(r[2] for r in rows)
    tot_new = sum(r[3] for r in rows)
    print(f"# {len(rows)} common queries vs {label}: "
          f"{tot_old:.1f}s -> {tot_new:.1f}s "
          f"(ratio {tot_new / tot_old:.2f}); "
          f"{n['ok']} ok, {n['box']} box, {n['adjudicated']} adjudicated, "
          f"{n['noisy']} noisy, {n['regressed']} regressed")
    if attribution:
        gate_note = (f"gate factors clamped to [1, {CAL_FACTOR_CAP}]"
                     if args.baseline else "informational in single-round mode")
        print(f"# calibration: {'; '.join(attribution)} ({gate_note})")
    elif new_cal:
        print(f"# calibration: this session {new_cal} (no prior round shares "
              f"a regime — baseline for future box attribution)")
    if n["regressed"]:
        print("# probe regressed queries interleaved before believing them "
              "(SCALE.md driver policy)", file=sys.stderr)
        raise SystemExit(1)
    if n["noisy"]:
        print("# noisy-and-slow rows are UNRESOLVED, not passed — re-run on "
              "a quiet box or probe interleaved (soft fail)", file=sys.stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
