"""Sampling/mixing operators against PLANTED ground truth (round 12).

The sampling family's oracles replay the same md5 arithmetic in SQL —
they verify the implementation agrees with itself across engines, not
that the statistics come out right. This harness plants corpora whose
correct behavior is known from the construction: a mixture whose BINDING
source is chosen by design, sources sized under/at/over a quota cap,
split weights with binomial concentration bounds, and epoch weights with
known floor/fraction structure.

Per seeded corpus (deterministic ``random.Random(seed)``):

1. MIXTURE CLOSED FORM (`mixture_rates`): integer per-source masses with
   one source planted far below its proportional share. The solver must
   report rate exactly 1.0 for that binding source, rate_s =
   share_s * T / mass_s (T = min mass/share, computed in Python) for the
   rest, kept_mass in exactly the normalized target proportions — and a
   target source absent from the corpus must zero the ENTIRE mixture
   (loud failure, not silent renormalization).
2. QUOTA CAP (`source_quota_sample`): sources planted under, exactly at,
   and over the cap. Under/at keep everything; over keeps EXACTLY cap
   rows; output is a subset of the input; and the kept set is identical
   under repartition(3) vs repartition(11).
3. SPLIT CONCENTRATION (`assign_split`): every id labeled, assignment
   identical across repartitionings, and each split's count within
   4 sigma of the binomial expectation for its weight (the md5-uniform
   hash behaves as a uniform — a biased bucketing fails loudly here).
4. STRATIFIED SAMPLE (`stratified_hash_sample`): fraction-1.0 stratum
   kept whole, unlisted stratum (default 0) dropped whole, fraction-0.5
   stratum within 4 sigma of half, output a subset of input, identical
   across reruns.
5. EPOCH WEIGHTS (`epoch_upsample`): weight 3.4 gives every id 3 or 4
   copies with the 4-copy count within 4 sigma of 40%; weight 0.7 gives
   0 or 1 with the kept count near 70%; (id, epoch) pairs unique.

    python examples/fuzz_sampling_planted.py [--seeds 20]
                                             [--out fuzz_sampling_last.json]

tests/test_fuzz_sampling_planted.py runs a 3-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1e-9


def _within(count: int, n: int, p: float, k: float = 4.0) -> bool:
    sigma = math.sqrt(n * p * (1 - p))
    return abs(count - n * p) <= k * sigma + 1


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.sampling import (
        assign_split,
        epoch_upsample,
        mixture_rates,
        source_quota_sample,
        stratified_hash_sample,
    )

    rng = random.Random(seed)
    violations: list[str] = []

    # --- 1. mixture closed form -------------------------------------
    shares = {"web": 0.6, "books": 0.3, "code": 0.1}
    # binding source planted: scale so 'code' has the smallest mass/share
    masses = {"web": rng.randint(50_000, 90_000),
              "books": rng.randint(30_000, 60_000),
              "code": rng.randint(500, 2_000)}
    binding = min(masses, key=lambda s: masses[s] / shares[s])
    rows = [(s, float(m)) for s, m in masses.items()]
    df = spark.createDataFrame(rows, "source string, mass double")
    got = {r["source"]: r for r in
           mixture_rates(df, shares, mass_col="mass").collect()}
    T = min(masses[s] / shares[s] for s in shares)
    for s in shares:
        want_rate = shares[s] * T / masses[s]
        if abs(got[s]["rate"] - want_rate) > 1e-6:
            violations.append(
                f"mixture: {s} rate {got[s]['rate']} want {want_rate}")
        if abs(got[s]["kept_mass"] - shares[s] * T) > 1e-3:
            violations.append(
                f"mixture: {s} kept_mass {got[s]['kept_mass']} "
                f"want {shares[s] * T}")
    if abs(got[binding]["rate"] - 1.0) > 1e-9:
        violations.append(
            f"mixture: binding source {binding} rate {got[binding]['rate']} != 1")
    # absent target source -> the whole mixture zeroes loudly
    got0 = {r["source"]: r["rate"] for r in mixture_rates(
        df, dict(shares, wiki=0.2), mass_col="mass").collect()}
    if any(abs(v) > TOL for v in got0.values()) or "wiki" not in got0:
        violations.append(f"mixture: absent source did not zero rates: {got0}")

    # --- shared docs table for 2-5 ----------------------------------
    cap = rng.choice([20, 35])
    src_sizes = {"under": rng.randint(3, cap - 1), "exact": cap,
                 "over": rng.randint(cap + 10, cap * 4),
                 "over2": rng.randint(cap + 1, cap * 2)}
    docs = []
    i = 0
    for s, n in src_sizes.items():
        for _ in range(n):
            docs.append((i, s))
            i += 1
    ddf = spark.createDataFrame(docs, "doc_id long, source string")

    kept_sets = {}
    for parts in (3, 11):
        kept = {r["doc_id"]: r["source"] for r in source_quota_sample(
            ddf.repartition(parts), cap=cap).collect()}
        kept_sets[parts] = set(kept)
        per_src: dict = {}
        for d, s in kept.items():
            per_src[s] = per_src.get(s, 0) + 1
        for s, n in src_sizes.items():
            want = min(n, cap)
            if per_src.get(s, 0) != want:
                violations.append(
                    f"quota/p{parts}: {s} kept {per_src.get(s, 0)} want {want}")
        if not set(kept) <= {d for d, _ in docs}:
            violations.append(f"quota/p{parts}: fabricated doc ids")
    if kept_sets[3] != kept_sets[11]:
        violations.append("quota: keep set depends on partitioning")

    # --- 3. split concentration + determinism -----------------------
    n_ids = 4000
    ids = spark.range(n_ids).select(F.col("id").alias("doc_id"))
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    assigns = {}
    for parts in (3, 11):
        rows_s = assign_split(ids.repartition(parts), "doc_id",
                              weights=weights, salt=f"s{seed}").collect()
        assigns[parts] = {r["doc_id"]: r["split"] for r in rows_s}
    if assigns[3] != assigns[11]:
        violations.append("split: assignment depends on partitioning")
    if len(assigns[3]) != n_ids:
        violations.append("split: rows dropped or duplicated")
    counts: dict = {}
    for v in assigns[3].values():
        counts[v] = counts.get(v, 0) + 1
    for name, w in weights.items():
        if not _within(counts.get(name, 0), n_ids, w):
            violations.append(
                f"split: {name} count {counts.get(name, 0)} outside 4 sigma "
                f"of {n_ids * w}")

    # --- 4. stratified sample ---------------------------------------
    strata = ddf.withColumn("doc_id", F.col("doc_id") + 10_000)
    frac = {"under": 1.0, "over": 0.5}  # 'exact'/'over2' unlisted -> dropped
    kept_rows = stratified_hash_sample(
        strata, "doc_id", "source", frac, salt=f"st{seed}").collect()
    kept_by_src: dict = {}
    for r in kept_rows:
        kept_by_src.setdefault(r["source"], set()).add(r["doc_id"])
    if len(kept_by_src.get("under", set())) != src_sizes["under"]:
        violations.append("stratified: fraction-1.0 stratum not kept whole")
    if kept_by_src.get("exact") or kept_by_src.get("over2"):
        violations.append("stratified: unlisted stratum leaked rows")
    if not _within(len(kept_by_src.get("over", set())), src_sizes["over"], 0.5):
        violations.append(
            f"stratified: 0.5 stratum kept {len(kept_by_src.get('over', set()))} "
            f"of {src_sizes['over']} — outside 4 sigma")

    # --- 5. epoch weights -------------------------------------------
    ep = epoch_upsample(ids, strata_col="doc_id", epochs={},
                        default_epochs=3.4, id_col="doc_id", salt=f"e{seed}")
    rows_e = ep.select("doc_id", "epoch").collect()
    pairs = [(r["doc_id"], r["epoch"]) for r in rows_e]
    if len(pairs) != len(set(pairs)):
        violations.append("epoch: duplicate (id, epoch) pairs")
    copies: dict = {}
    for d, _ in pairs:
        copies[d] = copies.get(d, 0) + 1
    if set(copies) != set(range(n_ids)) or any(
            c not in (3, 4) for c in copies.values()):
        violations.append("epoch: weight 3.4 must give every id 3 or 4 copies")
    n4 = sum(1 for c in copies.values() if c == 4)
    if not _within(n4, n_ids, 0.4):
        violations.append(f"epoch: 4-copy count {n4} outside 4 sigma of 40%")
    ep07 = epoch_upsample(ids, strata_col="doc_id", epochs={},
                          default_epochs=0.7, id_col="doc_id",
                          salt=f"e7{seed}")
    kept07 = [r["doc_id"] for r in ep07.select("doc_id").collect()]
    if len(kept07) != len(set(kept07)):
        violations.append("epoch: weight 0.7 emitted an id twice")
    if not _within(len(kept07), n_ids, 0.7):
        violations.append(
            f"epoch: 0.7 kept {len(kept07)} outside 4 sigma of 70%")

    return {
        "seed": seed,
        "binding_source": binding,
        "cap": cap,
        "src_sizes": src_sizes,
        "split_counts": counts,
        "epoch4_count": n4,
        "violations": violations,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_sampling_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-sampling", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} (binding={rec['binding_source']})",
              file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
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
