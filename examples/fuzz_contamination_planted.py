"""Contamination operators against PLANTED ground truth (round 13).

The contamination family's oracles replay the same shingle/cosine
arithmetic in SQL — they verify the implementation agrees with itself
across engines, not that the leak detection is RIGHT. This harness plants
corpora whose correct output is known from the construction alone
(VERDICT r12 item 1): test docs sharing exact n-gram windows of controlled
length with train docs (including the n-1 near-miss that must NOT flag),
a boilerplate shingle pushed past the stop-shingle cap, and embedding
pairs built at exact planted cosines straddling the round(6) threshold
convention.

Per seeded corpus (deterministic ``random.Random(seed)``, all tokens
globally unique except the planted overlaps):

N-GRAM CONTAINMENT (`ngram_contamination`, shingle_n=3):
1. WINDOW CLOSED FORM — a test doc of T unique tokens shares an
   L-consecutive-token window with a train doc: the pair must report
   n_common = L-2, test_shingles = T-2, containment = round((L-2)/(T-2),
   6). Two train docs sharing different windows of one test doc both
   appear. L = T plants containment exactly 1.0.
2. NEAR-MISS SOUNDNESS — a train doc sharing exactly n-1 = 2 consecutive
   tokens produces NO pair; pads are unique so the full result set must
   equal the planted pair dict exactly (completeness AND soundness).
3. DISTINCT SEMANTICS — test doc [a b c a b c] has 3 distinct trigrams;
   a train doc containing "a b c" once yields n_common = 1,
   containment = round(1/3, 6).
4. CASE FOLDING — a train doc carrying the UPPERCASED window still
   matches (lowercase=True is the operator default).
5. STOP-SHINGLE CAP — a boilerplate trigram planted in F > cap train
   docs: uncapped, all F pairs appear at containment 1/5; with
   max_doc_freq=cap every boilerplate pair vanishes while all
   rare-shingle pairs survive (the documented lower-bound semantics).
6. THRESHOLD / TOP-K — threshold=1.0 keeps exactly the full-containment
   pairs; top_k replays the (containment desc, test_id, train_id)
   ordering against a Python sort of the planted dict, exercising the
   boilerplate containment tie.
7. PARTITIONING INVARIANCE — repartition(3) vs repartition(11) on both
   sides produces the identical pair set.

EMBEDDING COSINE (`embedding_contamination`):
8. PLANTED COSINES — pair i lives in its own 2D coordinate plane
   (test = s_i * e_{2i}, train = q_i * (c_i e_{2i} + sqrt(1-c_i^2)
   e_{2i+1})), so cosine(test_i, train_j) is c_i when i = j and exactly 0
   otherwise, for ANY positive scales s_i, q_i. Plants straddle the
   threshold tau (0.3 or 0.5 per seed): tau + 0.4, tau + 0.01, tau
   exactly, and the round(6) convention edge — tau - 4e-7 MUST flag
   (rounds up to tau), tau - 6e-7 must NOT (rounds to tau - 1e-6);
   tau - 0.01 and -tau must not. Float error in the construction is
   ~1e-15, five orders below the 1e-7 rounding margin.
9. ZERO VECTORS — an all-zero test and train vector are dropped, never
   flagged, and produce no NaN.
10. The flagged set equals the planted set exactly, under repartition(3)
    vs repartition(11).

    python examples/fuzz_contamination_planted.py [--seeds 20]
                                     [--out fuzz_contamination_last.json]

tests/test_fuzz_contamination_planted.py runs a 2-seed slice per session.
"""

from __future__ import annotations

import argparse
import itertools
import json
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Vocab:
    """Globally-unique lowercase tokens; uniqueness is what makes every
    expected overlap a closed form of the construction."""

    def __init__(self, seed: int) -> None:
        self._c = itertools.count()
        self._seed = seed

    def fresh(self, k: int) -> list[str]:
        return [f"w{self._seed}x{next(self._c)}" for _ in range(k)]


def _expected_containment(n_common: int, test_shingles: int) -> float:
    # HALF_UP to 6 decimals, matching F.round; ties cannot arise from
    # (L-2)/(T-2) rationals with T <= 15 (no decimal expansion lands
    # exactly on a 5 in the 7th place)
    return math.floor(n_common / test_shingles * 1e6 + 0.5) / 1e6


def check_ngram(spark, seed: int) -> tuple[dict, list[str]]:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        unpersist_inputs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.contamination import (
        ngram_contamination,
    )

    rng = random.Random(seed)
    vb = _Vocab(seed)
    violations: list[str] = []

    tests: list[tuple[int, list[str]]] = []
    trains: list[tuple[int, list[str]]] = []
    # (test_id, train_id) -> (n_common, test_shingles)
    expected: dict[tuple[int, int], tuple[int, int]] = {}

    # 1. window closed form: T1 shared with two train docs
    T = rng.randint(8, 15)
    t1 = vb.fresh(T)
    tests.append((1001, t1))
    for rid in (2001, 2002):
        L = rng.randint(3, T)
        p = rng.randint(0, T - L)
        trains.append((rid, vb.fresh(2) + t1[p : p + L] + vb.fresh(2)))
        expected[(1001, rid)] = (L - 2, T - 2)

    # 2. near-miss: exactly 2 shared consecutive tokens -> NO pair
    t2 = vb.fresh(rng.randint(5, 9))
    tests.append((1002, t2))
    j = rng.randint(0, len(t2) - 2)
    trains.append((2003, vb.fresh(3) + t2[j : j + 2] + vb.fresh(3)))

    # full containment: the whole test doc inside a larger train doc
    t3 = vb.fresh(rng.randint(3, 8))
    tests.append((1003, t3))
    trains.append((2004, vb.fresh(rng.randint(1, 4)) + t3 + vb.fresh(rng.randint(1, 4))))
    expected[(1003, 2004)] = (len(t3) - 2, len(t3) - 2)

    # 3. distinct semantics: [a b c a b c] has 3 distinct trigrams
    abc = vb.fresh(3)
    tests.append((1004, abc + abc))
    trains.append((2005, vb.fresh(2) + abc + vb.fresh(2)))
    expected[(1004, 2005)] = (1, 3)

    # 4. case folding: uppercased window still matches
    t5 = vb.fresh(rng.randint(6, 10))
    tests.append((1005, t5))
    L5 = rng.randint(3, len(t5))
    p5 = rng.randint(0, len(t5) - L5)
    trains.append(
        (2006, vb.fresh(2) + [w.upper() for w in t5[p5 : p5 + L5]] + vb.fresh(2))
    )
    expected[(1005, 2006)] = (L5 - 2, len(t5) - 2)

    # 5. boilerplate shingle in F > cap train docs; T6 has 5 shingles
    cap = rng.randint(3, 6)
    n_boiler = cap + rng.randint(1, 4)
    boiler = vb.fresh(3)
    tests.append((1006, vb.fresh(2) + boiler + vb.fresh(2)))
    boiler_pairs = []
    for f in range(n_boiler):
        rid = 2100 + f
        trains.append((rid, vb.fresh(2) + boiler + vb.fresh(2)))
        expected[(1006, rid)] = (1, 5)
        boiler_pairs.append((1006, rid))

    # noise: test and train docs with no overlap at all
    tests.append((1007, vb.fresh(rng.randint(4, 9))))
    trains.append((2007, vb.fresh(rng.randint(4, 9))))
    # sub-trigram test doc: zero shingles, must simply be absent
    tests.append((1008, vb.fresh(2)))

    want = {
        k: (nc, ts, _expected_containment(nc, ts))
        for k, (nc, ts) in expected.items()
    }

    test_df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in tests], "doc_id long, text string"
    )
    train_df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in trains], "doc_id long, text string"
    )

    def run(train, test, **kw):
        out = ngram_contamination(train, test, shingle_n=3, **kw)
        rows = out.collect()
        unpersist_inputs(out)  # release the per-call persisted shingle
        # table (the operator's documented contract) — a 20-seed sweep
        # otherwise accumulates ~7 persisted RDDs per seed in one session
        return {
            (r["test_id"], r["train_id"]): (
                r["n_common"], r["test_shingles"], r["containment"])
            for r in rows
        }

    # 7. full set, exact, partitioning-invariant
    got_by_parts = {}
    for parts in (3, 11):
        got = run(train_df.repartition(parts), test_df.repartition(parts))
        got_by_parts[parts] = got
        if set(got) != set(want):
            violations.append(
                f"ngram/p{parts}: pair set mismatch — unexpected "
                f"{sorted(set(got) - set(want))}, missing "
                f"{sorted(set(want) - set(got))}")
        else:
            for k, (nc, ts, c) in want.items():
                gnc, gts, gc = got[k]
                if (gnc, gts) != (nc, ts) or abs(gc - c) > 1e-9:
                    violations.append(
                        f"ngram/p{parts}: pair {k} got {got[k]} want {(nc, ts, c)}")
    if got_by_parts[3] != got_by_parts[11]:
        violations.append("ngram: result depends on partitioning")

    # 5. stop-shingle cap drops exactly the boilerplate pairs
    got_cap = run(train_df, test_df, max_doc_freq=cap)
    want_cap = {k: v for k, v in want.items() if k not in set(boiler_pairs)}
    if set(got_cap) != set(want_cap):
        violations.append(
            f"ngram/cap{cap}: got {sorted(got_cap)} want {sorted(want_cap)}")

    # 6a. threshold 1.0 keeps exactly the full-containment pairs
    got_full = run(train_df, test_df, threshold=1.0)
    want_full = {k: v for k, v in want.items() if v[0] == v[1]}
    if set(got_full) != set(want_full):
        violations.append(
            f"ngram/threshold1: got {sorted(got_full)} want {sorted(want_full)}")

    # 6b. top_k replays the deterministic ordering (containment tie among
    # the boilerplate pairs is broken by test_id, train_id)
    k = rng.randint(3, min(8, len(want)))
    out_k = ngram_contamination(train_df, test_df, shingle_n=3, top_k=k)
    rows = out_k.collect()
    unpersist_inputs(out_k)
    got_order = [(r["test_id"], r["train_id"]) for r in rows]
    want_order = [
        key for key, _ in sorted(
            want.items(), key=lambda kv: (-kv[1][2], kv[0][0], kv[0][1])
        )[:k]
    ]
    if got_order != want_order:
        violations.append(f"ngram/top{k}: got {got_order} want {want_order}")

    return {
        "n_test": len(tests),
        "n_train": len(trains),
        "planted_pairs": len(want),
        "cap": cap,
        "boiler_docs": n_boiler,
        "top_k": k,
    }, violations


def check_embedding(spark, seed: int) -> tuple[dict, list[str]]:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.contamination import (
        embedding_contamination,
    )

    rng = random.Random(seed ^ 0xE3B)
    violations: list[str] = []
    tau = rng.choice([0.3, 0.5])

    # (cosine, must_flag): the two edge plants pin the round-then-threshold
    # convention — tau - 4e-7 rounds UP to tau (flagged), tau - 6e-7 rounds
    # to tau - 1e-6 (not)
    plants = [
        (min(tau + 0.4, 0.95), True),
        (tau + 0.01, True),
        (tau, True),
        (tau - 4e-7, True),
        (tau - 6e-7, False),
        (tau - 0.01, False),
        (0.0, False),
        (-tau, False),
    ]
    rng.shuffle(plants)
    dims = 2 * len(plants)
    scales = [2.0, 0.5, 4.0, 1.0, 8.0, 0.25]

    def vec(coords: dict[int, float]) -> list[float]:
        v = [0.0] * dims
        for d, x in coords.items():
            v[d] = x
        return v

    test_rows, train_rows = [], []
    want_pairs = set()
    for i, (c, flag) in enumerate(plants):
        s, q = rng.choice(scales), rng.choice(scales)
        test_rows.append((100 + i, vec({2 * i: s})))
        train_rows.append(
            (200 + i, vec({2 * i: q * c, 2 * i + 1: q * math.sqrt(1.0 - c * c)}))
        )
        if flag:
            want_pairs.add((100 + i, 200 + i))
    # 9. zero vectors on both sides: dropped, never flagged, no NaN
    test_rows.append((199, [0.0] * dims))
    train_rows.append((299, [0.0] * dims))

    test_df = spark.createDataFrame(test_rows, "vec_id long, embedding array<double>")
    train_df = spark.createDataFrame(train_rows, "vec_id long, embedding array<double>")

    got_by_parts = {}
    for parts in (3, 11):
        got = {
            (r["test_id"], r["train_id"])
            for r in embedding_contamination(
                test_df.repartition(parts), train_df.repartition(parts),
                threshold=tau,
            ).collect()
        }
        got_by_parts[parts] = got
        if got != want_pairs:
            violations.append(
                f"emb/p{parts}/tau={tau}: unexpected {sorted(got - want_pairs)}, "
                f"missing {sorted(want_pairs - got)}")
    if got_by_parts[3] != got_by_parts[11]:
        violations.append("emb: result depends on partitioning")

    return {
        "tau": tau,
        "emb_plants": len(plants),
        "emb_flagged": len(want_pairs),
    }, violations


def check_corpus(spark, seed: int) -> dict:
    ng_info, ng_viol = check_ngram(spark, seed)
    em_info, em_viol = check_embedding(spark, seed)
    rec = {"seed": seed, **ng_info, **em_info,
           "violations": ng_viol + em_viol}
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_contamination_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-contamination", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} (pairs={rec['planted_pairs']}, "
              f"cap={rec['cap']}, tau={rec['tau']})", file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "planted_pairs_total": sum(r["planted_pairs"] for r in records),
        "emb_plants_total": sum(r["emb_plants"] for r in records),
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
