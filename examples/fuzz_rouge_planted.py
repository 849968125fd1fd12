"""ROUGE metrics against PLANTED closed-form ground truth (round 12).

The ROUGE family ships three physically different implementations — the
Arrow pandas UDF (`rouge_scores_udf`, per-pair LCS dynamic program), the
pure-Catalyst unigram expression (`rouge1_f1_expr`), and the explode+
count-join batch path (`rouge_n_f1_df`) — verified so far by DuckDB
oracles and equivalence tests on fixed text. Oracles and the UDF share
arithmetic lineage; this harness breaks that by CONSTRUCTING pairs whose
ROUGE-1/2/L values are known in closed form from the construction
itself, no n-gram counting or DP anywhere in the expectation:

* PREFIX: reference = X distinct tokens; candidate = the first k of them
  + (m-k) alien tokens. Unigram overlap k, bigram overlap k-1 (the
  prefix is contiguous), LCS = k:
  R1 = 2k/(m+X), R2 = 2(k-1)/((m-1)+(X-1)), RL = 2k/(m+X).
* REVERSED SCATTER: candidate carries k >= 2 reference tokens in
  strictly DECREASING reference order with aliens interspersed. Unigram
  overlap k; bigram overlap 0 (reference bigrams are exactly the
  increasing consecutive pairs of distinct tokens); LCS = 1 (a common
  subsequence must be increasing in both, and the candidate's reference
  tokens are strictly decreasing): R2 = 0, RL = 2/(m+X).
* MULTISET CLIP: reference carries token "t" x3 in a run, candidate
  "t" x5 in a run. Unigram overlap min(5,3) = 3; bigram ("t","t")
  overlap min(4,2) = 2; LCS contribution 3 — all from run lengths.
* IDENTITY (all scores exactly 1.0), EMPTY candidate and DISJOINT
  vocabularies (all exactly 0.0).

Every pair is pushed through ALL THREE implementations and each must
equal the closed form to 1e-9 (exact fractions of small integers — any
deviation is a logic bug, not float noise).

    python examples/fuzz_rouge_planted.py [--seeds 20]
                                          [--out fuzz_rouge_last.json]

tests/test_fuzz_rouge_planted.py runs a 3-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1e-9


def gen_corpus(seed: int) -> list[dict]:
    """[{pair_id, g, r, want: {rouge1, rouge2, rougeL}}] — expectations
    derived from the construction parameters only."""
    rng = random.Random(seed)
    pairs = []
    pid = 0

    def fr(num: int, den: int) -> float:
        return 0.0 if num == 0 or den == 0 else 2.0 * num / den

    for _ in range(8):  # PREFIX
        X = rng.randint(6, 30)
        k = rng.randint(1, X)
        m_extra = rng.randint(0, 10)
        m = k + m_extra
        ref = [f"r{pid}_{i}" for i in range(X)]
        cand = ref[:k] + [f"a{pid}_{j}" for j in range(m_extra)]
        pairs.append({
            "pair_id": pid, "g": " ".join(cand), "r": " ".join(ref),
            "kind": "prefix",
            "want": {"rouge1": fr(k, m + X),
                     "rouge2": fr(k - 1, (m - 1) + (X - 1)) if m >= 2 and X >= 2 else 0.0,
                     "rougeL": fr(k, m + X)},
        })
        pid += 1

    for _ in range(8):  # REVERSED SCATTER
        X = rng.randint(6, 30)
        k = rng.randint(2, min(8, X))
        idx = sorted(rng.sample(range(X), k), reverse=True)
        ref = [f"r{pid}_{i}" for i in range(X)]
        cand = []
        for j, i in enumerate(idx):
            cand.append(ref[i])
            for _ in range(rng.randint(0, 2)):
                cand.append(f"a{pid}_{len(cand)}")
        m = len(cand)
        pairs.append({
            "pair_id": pid, "g": " ".join(cand), "r": " ".join(ref),
            "kind": "reversed",
            "want": {"rouge1": fr(k, m + X),
                     "rouge2": 0.0,
                     "rougeL": fr(1, m + X)},
        })
        pid += 1

    for _ in range(4):  # MULTISET CLIP
        nr = rng.randint(2, 4)
        ng = rng.randint(nr + 1, nr + 4)
        fill_r = rng.randint(2, 6)
        fill_g = rng.randint(2, 6)
        ref = [f"f{pid}_{i}" for i in range(fill_r)] + ["t"] * nr
        cand = ["t"] * ng + [f"a{pid}_{i}" for i in range(fill_g)]
        m, X = len(cand), len(ref)
        pairs.append({
            "pair_id": pid, "g": " ".join(cand), "r": " ".join(ref),
            "kind": "multiset",
            "want": {"rouge1": fr(nr, m + X),
                     "rouge2": fr(nr - 1, (m - 1) + (X - 1)),
                     "rougeL": fr(nr, m + X)},
        })
        pid += 1

    X = rng.randint(4, 20)  # IDENTITY
    ref = [f"r{pid}_{i}" for i in range(X)]
    pairs.append({"pair_id": pid, "g": " ".join(ref), "r": " ".join(ref),
                  "kind": "identity",
                  "want": {"rouge1": 1.0, "rouge2": 1.0 if X >= 2 else 0.0,
                           "rougeL": 1.0}})
    pid += 1
    pairs.append({"pair_id": pid, "g": "", "r": " ".join(ref),
                  "kind": "empty",
                  "want": {"rouge1": 0.0, "rouge2": 0.0, "rougeL": 0.0}})
    pid += 1
    pairs.append({"pair_id": pid, "g": f"x{pid}_0 x{pid}_1 x{pid}_2",
                  "r": " ".join(ref), "kind": "disjoint",
                  "want": {"rouge1": 0.0, "rouge2": 0.0, "rougeL": 0.0}})
    pid += 1
    return pairs


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.rouge import (
        rouge1_f1_expr,
        rouge_n_f1_df,
        rouge_scores_udf,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        unpersist_inputs,
    )

    pairs = gen_corpus(seed)
    df = spark.createDataFrame(
        [(p["pair_id"], p["g"], p["r"]) for p in pairs],
        "pair_id long, g string, r string",
    ).repartition(8)
    violations: list[str] = []

    def bad(path: str, metric: str, got_by_id: dict) -> None:
        for p in pairs:
            want = p["want"][metric]
            got = got_by_id.get(p["pair_id"])
            if got is None or abs(got - want) > TOL:
                violations.append(
                    f"{path}/{metric}: pair {p['pair_id']} ({p['kind']}) "
                    f"got {got} want {want}")

    udf = {
        r["pair_id"]: r
        for r in df.select(
            "pair_id", rouge_scores_udf("g", "r").alias("s")
        ).select("pair_id", "s.rouge1_f", "s.rouge2_f", "s.rougeL_f").collect()
    }
    bad("udf", "rouge1", {i: r["rouge1_f"] for i, r in udf.items()})
    bad("udf", "rouge2", {i: r["rouge2_f"] for i, r in udf.items()})
    bad("udf", "rougeL", {i: r["rougeL_f"] for i, r in udf.items()})

    expr = {
        r["pair_id"]: r["f1"]
        for r in df.select(
            "pair_id", rouge1_f1_expr("g", "r").alias("f1")
        ).collect()
    }
    bad("expr", "rouge1", expr)

    for n, metric in ((1, "rouge1"), (2, "rouge2")):
        out = rouge_n_f1_df(df, n=n, gen_col="g", ref_col="r",
                            id_cols=("pair_id",), out_col="f1")
        got = {r["pair_id"]: r["f1"] for r in out.collect()}
        unpersist_inputs(out)
        bad(f"batch_n{n}", metric, got)

    kinds = {}
    for p in pairs:
        kinds[p["kind"]] = kinds.get(p["kind"], 0) + 1
    return {"seed": seed, "n_pairs": len(pairs), "kinds": kinds,
            "violations": violations}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_rouge_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-rouge", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status}", file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "pairs_total": sum(r["n_pairs"] for r in records),
        "violations_total": sum(len(r["violations"]) for r in records),
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
