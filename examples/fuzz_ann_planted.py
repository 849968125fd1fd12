"""ANN/similarity fuzzer against PLANTED ground truth (VERDICT r10 item 5,
embedding leg — the text-dedup leg is examples/fuzz_dedup_planted.py).

The similarity family's correctness rests on the fixed embeddings table
plus oracle replay; like the dedup leg, neither verifies that the
operators find what is actually THERE. This harness generates embedding
corpora with known structure and asserts recovery:

Per seeded corpus (deterministic numpy Generator, no wall clock):

* ~120 unit base vectors (dim 16 or 32, standard normal, normalized) —
  random-pair cosine concentrates near 0 (sd ~ 1/sqrt(d)), so planted
  twins are the ONLY high-cosine structure.
* planted TWIN clusters: 10 bases get 1-2 twins each, v' = normalize(v +
  sigma*g) with sigma chosen to target cosine ~{0.9988, 0.995, 0.96} —
  sigma = sqrt((1/c^2 - 1)/d) directly controls the planted angle.

Invariants asserted (violations -> exit 1, recorded per seed):

1. BRUTE-FORCE EXACTNESS: `cosine_topk` (the broadcast cross-join + window
   rerank) must return exactly the NumPy-computed top-k — same
   (sim desc, neighbor_id) tiebreak — for every query whose k-th margin
   exceeds 1e-9 (float-summation-order ties are skipped, measure-zero on
   random data).
2. FULL-PROBE IVF EQUIVALENCE: `ivf_topk` with n_probe = n_lists probes
   every cell, so it must EQUAL brute-force top-k exactly — a
   deterministic end-to-end check of assignment, probing, dedup, and
   rerank with zero recall luck involved.
3. SRP-LSH RECALL >= HYPERPLANE THEORY: for each planted twin pair with
   true cosine c, the probability a random hyperplane separates it is
   theta/pi (theta = arccos c); with n_planes bits and hamming-1
   multi-probe the candidate probability is p^n + n*p^(n-1)*(1-p),
   p = 1 - theta/pi. Aggregate twin recall of
   `random_hyperplane_lsh_topk` must be >= E[p_cand] - 3*sigma - 1 miss
   of slack (the plane set is fixed; randomness is the seeded vectors).
4. NEAR-DUP VERIFY SOUNDNESS: every pair emitted by
   `embedding_near_dup_pairs` (threshold 0.9) must have TRUE NumPy cosine
   >= 0.9 - 1e-9 (the exact-verify stage admits no estimator slack), and
   its aggregate recall over planted twins is held to the same
   hamming<=1 banding floor as invariant 3.

    python examples/fuzz_ann_planted.py [--seeds 20] [--out fuzz_ann_last.json]

tests/test_fuzz_ann_planted.py runs a 3-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_BASE = 120
N_TWIN_CLUSTERS = 10
TOP_K = 5
N_PLANES = 8
N_LISTS = 8
NEAR_DUP_T = 0.9
TARGET_COSINES = [0.9988, 0.995, 0.96]


def candidate_prob(c: float, n_planes: int = N_PLANES) -> float:
    """P(twin is a candidate) under hamming<=1 multi-probe SRP banding."""
    theta = math.acos(max(-1.0, min(1.0, c)))
    p = 1.0 - theta / math.pi
    return p**n_planes + n_planes * p ** (n_planes - 1) * (1.0 - p)


def gen_corpus(seed: int) -> dict:
    """Deterministic embedding corpus with planted twin clusters.

    Returns {dim, vectors: {vec_id: np.ndarray}, twins: [(id_base,
    id_twin, target_c, true_c)]}; ids are shuffled so cluster members are
    never adjacent."""
    rng = np.random.default_rng(seed)
    dim = int(rng.choice([16, 32]))
    base = rng.standard_normal((N_BASE, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    rows = [base[i] for i in range(N_BASE)]
    twin_pairs = []  # (base_row, twin_row, target_c)
    for ci in range(N_TWIN_CLUSTERS):
        b = ci  # bases 0..9 host the twin clusters
        for _ in range(int(rng.integers(1, 3))):
            c = float(rng.choice(TARGET_COSINES))
            sigma = math.sqrt((1.0 / c**2 - 1.0) / dim)
            v = base[b] + sigma * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            twin_pairs.append((b, len(rows), c))
            rows.append(v)

    ids = rng.permutation(len(rows))
    vectors = {int(ids[i]): rows[i] for i in range(len(rows))}
    twins = [
        (
            int(ids[b]),
            int(ids[t]),
            c,
            float(np.dot(rows[b], rows[t])),
        )
        for b, t, c in twin_pairs
    ]
    return {"dim": dim, "vectors": vectors, "twins": twins}


def numpy_topk(vectors: dict, k: int = TOP_K) -> dict:
    """query_id -> ordered [(neighbor_id, sim)] with the engine's
    (sim desc, neighbor_id asc) tiebreak, self excluded. Also returns the
    margin between the k-th and (k+1)-th sim for tie-skipping."""
    ids = sorted(vectors)
    mat = np.stack([vectors[i] for i in ids])
    sims = mat @ mat.T
    out = {}
    for qi, q in enumerate(ids):
        scored = sorted(
            ((float(sims[qi, ci]), ids[ci]) for ci in range(len(ids)) if ci != qi),
            key=lambda t: (-t[0], t[1]),
        )
        margin = scored[k - 1][0] - scored[k][0] if len(scored) > k else 1.0
        out[q] = ([(n, s) for s, n in scored[:k]], margin)
    return out


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
        cosine_topk,
        embedding_near_dup_pairs,
        ivf_assign,
        ivf_fixed_centroids,
        ivf_topk,
        random_hyperplane_lsh_topk,
    )

    corpus = gen_corpus(seed)
    dim, vectors, twins = corpus["dim"], corpus["vectors"], corpus["twins"]
    violations: list[str] = []

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vectors.items())],
        schema,
    ).repartition(8)
    queries = df.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )

    truth = numpy_topk(vectors)

    # 1. brute-force exactness vs NumPy
    brute_rows = cosine_topk(queries, df, k=TOP_K).collect()
    brute: dict = {}
    for r in brute_rows:
        brute.setdefault(r["query_id"], []).append(
            (r["rnk"], r["neighbor_id"], r["sim"])
        )
    brute_sets = {}
    for q, (want, margin) in truth.items():
        got = sorted(brute.get(q, []))
        got_ids = [n for _, n, _ in got]
        brute_sets[q] = set(got_ids)
        if margin <= 1e-9:
            continue  # summation-order tie at the k boundary: skip
        if got_ids != [n for n, _ in want]:
            violations.append(
                f"brute: query {q} got {got_ids} want {[n for n, _ in want]}"
            )
        for (_, n, s), (wn, ws) in zip(got, want):
            if abs(s - ws) > 1e-6:
                violations.append(
                    f"brute: query {q} neighbor {n} sim {s} vs numpy {ws}"
                )
                break

    # 2. full-probe IVF == brute-force (zero recall luck)
    cents = ivf_fixed_centroids(dim, n_lists=N_LISTS)
    assigned = ivf_assign(df, cents)
    ivf_rows = ivf_topk(
        queries, assigned, cents, k=TOP_K, n_probe=N_LISTS
    ).collect()
    ivf: dict = {}
    for r in ivf_rows:
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, (want, margin) in truth.items():
        if margin <= 1e-9:
            continue
        if ivf.get(q, set()) != {n for n, _ in want}:
            violations.append(
                f"ivf_full_probe: query {q} got {sorted(ivf.get(q, set()))} "
                f"want {sorted(n for n, _ in want)}"
            )

    # 3. SRP-LSH twin recall vs hyperplane banding theory
    lsh_rows = random_hyperplane_lsh_topk(
        queries, df, dim=dim, k=TOP_K, n_planes=N_PLANES, multi_probe=True
    ).collect()
    lsh: dict = {}
    for r in lsh_rows:
        lsh.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exp_p, var_p, hits = 0.0, 0.0, 0
    for b, t, _, c in twins:
        # hamming(sig_b, sig_t) <= 1 is SYMMETRIC: b surfaces t iff t
        # surfaces b — one event, not two independent chances, so the
        # floor uses p, and the either-endpoint check below only absorbs
        # top-k truncation asymmetry
        p = candidate_prob(c)
        exp_p += p
        var_p += p * (1 - p)
        if t in lsh.get(b, set()) or b in lsh.get(t, set()):
            hits += 1
    floor = exp_p - 3.0 * math.sqrt(var_p) - 1.0
    if hits < floor:
        violations.append(
            f"srp_lsh: twin recall {hits}/{len(twins)} below theory floor "
            f"{floor:.2f}"
        )

    # 4. near-dup verify soundness + banded recall floor
    nd_rows = embedding_near_dup_pairs(
        df, dim=dim, threshold=NEAR_DUP_T, n_planes=N_PLANES
    ).collect()
    nd = set()
    for r in nd_rows:
        key = (min(r["id1"], r["id2"]), max(r["id1"], r["id2"]))
        nd.add(key)
        true_c = float(np.dot(vectors[key[0]], vectors[key[1]]))
        if true_c < NEAR_DUP_T - 1e-9:
            violations.append(
                f"near_dup: emitted pair {key} cosine {r['cosine']} but "
                f"true {true_c:.6f} < {NEAR_DUP_T}"
            )
        if abs(r["cosine"] - true_c) > 1e-6:
            violations.append(
                f"near_dup: pair {key} cosine {r['cosine']} vs numpy "
                f"{true_c}"
            )
    nd_exp, nd_var, nd_hits, eligible = 0.0, 0.0, 0, 0
    for b, t, _, c in twins:
        if c < NEAR_DUP_T:
            continue
        eligible += 1
        p = candidate_prob(c)
        nd_exp += p
        nd_var += p * (1 - p)
        if (min(b, t), max(b, t)) in nd:
            nd_hits += 1
    nd_floor = nd_exp - 3.0 * math.sqrt(nd_var) - 1.0
    if nd_hits < nd_floor:
        violations.append(
            f"near_dup: twin recall {nd_hits}/{eligible} below theory "
            f"floor {nd_floor:.2f}"
        )

    return {
        "seed": seed,
        "dim": dim,
        "n_vectors": len(vectors),
        "n_twins": len(twins),
        "srp_hits": hits,
        "srp_theory_floor": round(floor, 2),
        "near_dup_hits": nd_hits,
        "near_dup_eligible": eligible,
        "violations": violations,
    }


def run(seeds, log=print) -> dict:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-ann", shuffle_partitions=8)
    results = []
    for seed in seeds:
        rec = check_corpus(spark, seed)
        results.append(rec)
        log(
            f"# seed {seed}: dim={rec['dim']} vecs={rec['n_vectors']} "
            f"srp={rec['srp_hits']}/{rec['n_twins']} "
            f"(floor {rec['srp_theory_floor']}) "
            f"nd={rec['near_dup_hits']}/{rec['near_dup_eligible']} "
            f"violations={len(rec['violations'])}"
        )
        for v in rec["violations"]:
            log(f"#   VIOLATION: {v}")
    return {
        "seeds": list(seeds),
        "corpora": results,
        "n_violations": sum(len(r["violations"]) for r in results),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_ann_last.json"))
    args = ap.parse_args()
    rec = run(range(args.seeds), log=lambda m: print(m, file=sys.stderr))
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps({k: rec[k] for k in ("seeds", "n_violations")}))
    if rec["n_violations"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
