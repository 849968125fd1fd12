"""Sequence packing against PLANTED ground truth (round 12).

``pack_sequences`` is oracled (window replay for offset mode, a
recursive-CTE walk for greedy) on the fixed documents table; this harness
GENERATES corpora with planted token-length structure — boundary-exact
docs, oversized docs, long runs of tiny docs — and asserts the packing
theory directly, partition-for-partition, plus the determinism contract
the 100 TB story rests on.

Per seeded corpus (deterministic ``random.Random(seed)``):

* ~200 docs with integer ids over ``n_shards=4`` shards; token lengths
  drawn from four planted classes: tiny (1..max/8), medium, EXACTLY
  ``max_tokens`` (fills a greedy bin alone), and OVERSIZED (max+1..2*max
  — greedy must isolate these).

Invariants (violations -> exit 1, recorded per seed):

1. EXACTLY-ONCE, both modes: the multiset of output doc ids equals the
   input ids — packing never drops or duplicates a document.
2. GREEDY CAPACITY SOUNDNESS: every bin's token sum <= max_tokens,
   except a bin holding a single oversized document; every oversized
   document is ALONE in its bin.
3. EXACT PARTITION REPLAY, both modes: per shard, a from-first-
   principles Python walk (greedy fold / floor(start_offset/max))
   produces the same GROUPING of docs into bins — compared as ordered
   partitions, so the check is numbering-invariant and cannot drift
   with seq-id conventions.
4. PARTITIONING INVARIANCE: the same corpus through
   ``docs.repartition(3)`` and ``docs.repartition(11)`` yields identical
   (shard, partition) assignments — bin membership is a pure function of
   the data, never of physical layout.
5. STRING-ID PATH: non-integral ids route through the hash shard; the
   exactly-once and greedy-capacity invariants must still hold (the
   shard function is opaque to the replay, the theory is not).

    python examples/fuzz_packing_planted.py [--seeds 20]
                                            [--out fuzz_packing_last.json]

tests/test_fuzz_packing_planted.py runs a 3-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SHARDS = 4


def gen_corpus(seed: int) -> dict:
    rng = random.Random(seed)
    max_tokens = rng.choice([128, 256, 512])
    docs = []
    n = rng.randint(150, 250)
    n_exact = n_over = 0
    for i in range(n):
        kind = rng.random()
        if kind < 0.55:
            t = rng.randint(1, max_tokens // 8)
        elif kind < 0.85:
            t = rng.randint(max_tokens // 8, max_tokens - 1)
        elif kind < 0.93:
            t = max_tokens
            n_exact += 1
        else:
            t = rng.randint(max_tokens + 1, 2 * max_tokens)
            n_over += 1
        docs.append((i, t))
    rng.shuffle(docs)  # input order never matters
    return {"docs": docs, "max_tokens": max_tokens,
            "n_exact": n_exact, "n_over": n_over}


def greedy_partition(shard_docs: list, max_tokens: int) -> list:
    """[(doc_id, ...) per bin] — the operator's documented rule: a doc
    opens a new bin whenever adding it would push past the budget."""
    bins, cur, cur_sum = [], [], 0
    for i, t in shard_docs:
        if cur and cur_sum + t > max_tokens:
            bins.append(tuple(cur))
            cur, cur_sum = [], 0
        cur.append(i)
        cur_sum += t
    if cur:
        bins.append(tuple(cur))
    return bins


def offset_partition(shard_docs: list, max_tokens: int) -> list:
    """Bins = contiguous runs with equal floor(start_offset/max)."""
    bins: dict = {}
    start = 0
    for i, t in shard_docs:
        bins.setdefault(start // max_tokens, []).append(i)
        start += t
    return [tuple(bins[k]) for k in sorted(bins)]


def _actual_partition(rows) -> dict:
    """shard -> [bin tuples ordered by min doc id], docs id-ordered."""
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault((r["shard"], r["seq_id"]), []).append(r["doc_id"])
    out: dict = {}
    for (shard, _), ids in by_bin.items():
        out.setdefault(shard, []).append(tuple(sorted(ids)))
    return {s: sorted(b, key=lambda t: t[0]) for s, b in out.items()}


def check_corpus(spark, seed: int) -> dict:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.packing import (
        pack_sequences,
    )

    corpus = gen_corpus(seed)
    max_tokens = corpus["max_tokens"]
    docs_list = corpus["docs"]
    tok_of = dict(docs_list)
    oversized = {i for i, t in docs_list if t > max_tokens}
    violations: list[str] = []

    df = spark.createDataFrame(docs_list, "doc_id long, n_tokens int")
    want_parts = {}
    for mode, fn in (("greedy", greedy_partition), ("offset", offset_partition)):
        per_shard = {}
        for i, t in sorted(docs_list):
            per_shard.setdefault(i % N_SHARDS, []).append((i, t))
        want_parts[mode] = {s: fn(d, max_tokens) for s, d in per_shard.items()}

    results = {}
    for mode in ("greedy", "offset"):
        for parts in (3, 11):  # invariant 4: physical layout never matters
            rows = pack_sequences(
                df.repartition(parts), max_tokens, n_shards=N_SHARDS, mode=mode
            ).select("doc_id", "n_tokens", "shard", "seq_id").collect()
            got_ids = sorted(r["doc_id"] for r in rows)
            if got_ids != sorted(i for i, _ in docs_list):
                violations.append(f"{mode}/p{parts}: not exactly-once")
                continue
            part = _actual_partition(rows)
            key = (mode, parts)
            results[key] = part
            if part != want_parts[mode]:
                bad = {s: (part.get(s), want_parts[mode].get(s))
                       for s in set(part) | set(want_parts[mode])
                       if part.get(s) != want_parts[mode].get(s)}
                first = dict(list(bad.items())[:1])
                violations.append(f"{mode}/p{parts}: partition mismatch {first}")
            if mode == "greedy":
                for (shard, bin_ids) in [(s, b) for s, bs in part.items() for b in bs]:
                    total = sum(tok_of[i] for i in bin_ids)
                    if total > max_tokens and not (
                            len(bin_ids) == 1 and bin_ids[0] in oversized):
                        violations.append(
                            f"greedy/p{parts}: bin {bin_ids} sums {total} "
                            f"> {max_tokens}")
                    if any(i in oversized for i in bin_ids) and len(bin_ids) > 1:
                        violations.append(
                            f"greedy/p{parts}: oversized doc shares bin {bin_ids}")
        if results.get((mode, 3)) != results.get((mode, 11)):
            violations.append(f"{mode}: assignment depends on partitioning")

    # invariant 5: string ids -> hash shard; soundness still holds
    sdf = spark.createDataFrame(
        [(f"d{i:05d}", t) for i, t in docs_list], "doc_id string, n_tokens int"
    )
    rows = pack_sequences(sdf, max_tokens, n_shards=N_SHARDS, mode="greedy"
                          ).select("doc_id", "n_tokens", "shard", "seq_id").collect()
    if sorted(r["doc_id"] for r in rows) != sorted(f"d{i:05d}" for i, _ in docs_list):
        violations.append("greedy/string-id: not exactly-once")
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault((r["shard"], r["seq_id"]), []).append(
            (r["doc_id"], r["n_tokens"]))
    for bin_key, members in by_bin.items():
        total = sum(t for _, t in members)
        if total > max_tokens and not (len(members) == 1
                                       and members[0][1] > max_tokens):
            violations.append(
                f"greedy/string-id: bin {bin_key} sums {total} > {max_tokens}")

    return {
        "seed": seed,
        "max_tokens": max_tokens,
        "n_docs": len(docs_list),
        "n_exact": corpus["n_exact"],
        "n_oversized": corpus["n_over"],
        "n_greedy_bins": sum(len(b) for b in want_parts["greedy"].values()),
        "violations": violations,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_packing_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-packing", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} (bins={rec['n_greedy_bins']}, "
              f"oversized={rec['n_oversized']})", file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "oversized_total": sum(r["n_oversized"] for r in records),
        "exact_fit_total": sum(r["n_exact"] for r in records),
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
