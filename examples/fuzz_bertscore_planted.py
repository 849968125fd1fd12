"""BERTScore family against PLANTED ground truth (round 13).

`bertscore_hard_match` (the Catalyst fast path the `bertscore_mock_pairs`
oracle replays arithmetic-for-arithmetic in DuckDB) and
`bertscore_greedy_pairs` (the pandas-UDF matmul path) both reduce, under
a one-hot kernel, to: precision = fraction of candidate tokens with a
same-bucket token in the reference, recall symmetric, F1 harmonic. The
existing equivalence test pins the two paths to EACH OTHER; this harness
pins both to values that follow from the construction alone.

Per seed, token pools A (shared), B (candidate-only), C (reference-only)
are drawn as random lowercase words, regenerated until all distinct
words land in distinct hash buckets (a well-formedness guard via the
Python twin — expectations never touch the hash). A shared subset
S ⊆ A appears on BOTH sides at least once (extra S-draws add matching
multiplicity); candidate pads with B-words, reference with C-words, so
every S-token matches and every B/C-token does not:

    P = (#S-tokens in candidate) / len(candidate)
    R = (#S-tokens in reference) / len(reference)
    F1 = 2PR/(P+R)

are known before any engine code runs. Plants additionally cover: the
identical pair (exactly 1/1/1), disjoint pair (0/0/0), duplicate-token
multiplicities on both sides, empty candidate (P=0), empty reference
(R=0), both empty and NULL rows ((0,0,0) by the documented contract),
and the single-token pair. Both implementations must hit every plant,
and the UDF path must be partitioning-invariant (repartition 2 vs 5).

    python examples/fuzz_bertscore_planted.py [--seeds 20]
                                        [--out fuzz_bertscore_last.json]

tests/test_fuzz_bertscore_planted.py runs a 2-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _draw_pools(rng: random.Random, py_bucket, n_buckets: int):
    """Three disjoint word pools with pairwise-distinct buckets. The
    Python twin is used ONLY to reject ill-formed plants (a bucket
    collision would make a B-token spuriously match an A-token) — the
    P/R/F1 expectations never involve it."""
    words: list[str] = []
    seen_buckets: set[int] = set()
    while len(words) < 12:
        w = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 9)))
        b = py_bucket(w, n_buckets)
        if w in words or b in seen_buckets:
            continue
        words.append(w)
        seen_buckets.add(b)
    return words[:4], words[4:8], words[8:12]  # A shared, B cand, C ref


def check_corpus(spark, seed: int) -> dict:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.bertscore import (
        _N_BUCKETS,
        _py_token_bucket,
        bertscore_greedy_pairs,
        bertscore_hard_match,
        one_hot_bucket_encoder,
    )

    rng = random.Random(628000 + seed)
    violations: list[str] = []

    A, B, C = _draw_pools(rng, _py_token_bucket, _N_BUCKETS)

    rows: list[tuple[int, str | None, str | None]] = []
    want: dict[int, tuple[float, float]] = {}  # (P, R); F1 derived
    i = 0

    # --- random share-structured pairs --------------------------------
    # every word of the shared subset S appears on BOTH sides at least
    # once, so each S-token matches and each B/C-token does not; extra
    # S-draws (with replacement) only add matching multiplicity
    for _ in range(rng.randint(3, 6)):
        S = rng.sample(A, k=rng.randint(1, len(A)))
        xc = rng.randint(0, 3)          # extra shared draws in candidate
        nb = rng.randint(0, 4)          # cand-only tokens
        xr = rng.randint(0, 3)          # extra shared draws in reference
        mc = rng.randint(0, 4)          # ref-only tokens
        cand = list(S) + rng.choices(S, k=xc) + rng.choices(B, k=nb)
        ref = list(S) + rng.choices(S, k=xr) + rng.choices(C, k=mc)
        rng.shuffle(cand)
        rng.shuffle(ref)
        rows.append((i, " ".join(cand), " ".join(ref)))
        want[i] = ((len(S) + xc) / (len(S) + xc + nb),
                   (len(S) + xr) / (len(S) + xr + mc))
        i += 1

    # --- anchors -------------------------------------------------------
    same = " ".join(rng.choices(A + B, k=rng.randint(2, 6)))
    rows.append((i, same, same))            # identical pair
    want[i] = (1.0, 1.0)
    i += 1
    rows.append((i, " ".join(rng.choices(B, k=3)),
                 " ".join(rng.choices(C, k=4))))  # fully disjoint
    want[i] = (0.0, 0.0)
    i += 1
    dup = A[0]
    rows.append((i, f"{dup} {dup} {dup} {B[0]}", f"{dup} {C[0]}"))
    want[i] = (0.75, 0.5)                   # multiplicity both sides
    i += 1
    rows.append((i, A[1], A[1]))            # single-token pair
    want[i] = (1.0, 1.0)
    i += 1
    rows.append((i, "", " ".join(A[:2])))   # empty candidate
    want[i] = (0.0, 0.0)
    i += 1
    rows.append((i, " ".join(A[:2]), ""))   # empty reference
    want[i] = (0.0, 0.0)
    i += 1
    rows.append((i, "", ""))                # both empty
    want[i] = (0.0, 0.0)
    i += 1
    rows.append((i, None, None))            # NULL contract
    want[i] = (0.0, 0.0)
    i += 1

    df = spark.createDataFrame(
        rows, "pair_id long, candidate string, reference string")

    def expect_f1(p: float, r: float) -> float:
        return (2 * p * r / (p + r)) if (p + r) > 0 else 0.0

    def run_path(name: str, out_df) -> None:
        got = {r["pair_id"]: (r["bert_precision"], r["bert_recall"],
                              r["bert_f1"])
               for r in out_df.collect()}
        for d, (wp, wr) in want.items():
            gp, gr, gf = got[d]
            wf = expect_f1(wp, wr)
            if abs(gp - wp) > 1e-12 or abs(gr - wr) > 1e-12 \
                    or abs(gf - wf) > 1e-12:
                violations.append(
                    f"{name}/pair{d}: got ({gp}, {gr}, {gf}) "
                    f"!= want ({wp}, {wr}, {wf})")

    run_path("hard", bertscore_hard_match(df))
    enc = one_hot_bucket_encoder()
    run_path("greedy/p2",
             bertscore_greedy_pairs(df.repartition(2), encoder=enc))
    run_path("greedy/p5",
             bertscore_greedy_pairs(df.repartition(5), encoder=enc))

    return {"seed": seed, "pairs": len(rows), "violations": violations}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_bertscore_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-bertscore", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} pairs={rec['pairs']}",
              file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "pairs_total": sum(r["pairs"] for r in records),
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
