"""Dedup/LSH fuzzer against PLANTED ground truth (VERDICT r10 item 5).

The SQL-grammar fuzzer covers the relational surface; the dedup family's
correctness had rested on fixed testdata plus oracle replay — both verify
the IMPLEMENTATION agrees with an independent construction, neither that
the construction finds what is actually there. This harness closes that:
it GENERATES corpora with known structure and asserts the operators
recover it.

Per seeded corpus (deterministic `random.Random(seed)`, no wall clock):

* ~40 base docs of 80-150 tokens drawn from a 2000-word vocab — random
  3-shingle overlap between distinct bases is ~0 by construction (the
  shingle space is vast), so planted structure is the ONLY structure.
* planted EXACT groups: k bases cloned verbatim 1-3 times.
* planted NEAR-DUP families: k bases plus 1-3 variants each, produced by
  token substitution at a controlled rate eps in {0.02, 0.05, 0.1, 0.25}
  — eps directly controls shingle overlap, hence true Jaccard.

Invariants asserted (violations -> exit 1, recorded per seed):

1. `exact_dedup` completeness AND soundness: one survivor per planted
   exact group with n_copies == group size; every other doc n_copies == 1;
   survivor count == n_docs - sum(group_size - 1).
2. MinHash-LSH recall >= its banding-theory bound: for every planted
   (base, variant) pair the TRUE 3-shingle Jaccard s is computed in
   Python; banding theory (r = n_hashes/n_bands rows, b = n_bands bands)
   detects the pair with p(s) = 1 - (1 - s^r)^b. Sure-thing pairs
   (p(s) >= SURE_P = 0.999, which eps <= 0.02 yields) must ALL be
   candidates, and aggregate recall over all planted pairs must be
   >= E[p] - 3*sigma - 1 miss of slack (the hash family is fixed; the
   randomness is the seeded shingle sets).
3. LSH estimator soundness: any candidate pair passing the est_jaccard
   >= 0.5 filter must have TRUE Jaccard >= 0.25 (64-hash estimator noise
   is sigma ~= 0.0625; 0.25 is 4 sigma below the filter line).
4. Components reconstruct the planted clusters: pairs (threshold 0.5) ->
   `connected_components`; every TIGHT family (eps <= TIGHT_EPS = 0.02,
   where both banding and the estimator have >=4-sigma margin) and every
   exact group lands in ONE component unconditionally; LOOSER families
   must reassemble whenever LSH in fact surfaced all their planted edges
   (conditioning on detection tests the closure, not banding luck at
   J~0.7 where theory itself misses ~1%); and no component ever spans
   two different planted families (cross-family true Jaccard ~0, so a
   merge is a real false positive, not noise).
5. SimHash determinism on clones: planted exact copies have IDENTICAL
   32-bit signatures, so `simhash_near_dup_pairs` must emit every
   within-group pair with hamming == 0 — no banding luck involved
   (identical signatures share all bands by construction).
6. Exact n-gram Jaccard (`ngram_jaccard_pairs`, no LSH in the path):
   every planted pair with true J comfortably above the threshold must
   appear with jaccard == round(true J, 6) exactly; every exact-group
   pair scores 1.0; and EVERY emitted pair's score must equal the
   Python-recomputed truth — the inverted-index join is exact or it is
   wrong, there is no probabilistic excuse.
7. `line_dedup` vs a Python first-occurrence oracle: a boilerplate line
   appended to a seeded subset of docs (plus the clones' naturally
   repeated content lines) must be kept only at its global first
   (doc_id, line_idx) occurrence; reassembled text, n_lines, and
   n_removed are compared per doc against the replayed rule.
8. Winnowing guarantee (Schleimer et al.): two fresh-alphabet docs
   sharing a planted 30-token run (>> k + w - 1 chars) must share >= 1
   fingerprint — the theorem, not a probability — and planted clones
   must have IDENTICAL fingerprint sets.
9. `span_dedup` vs a Python first-occurrence replay over 50-token
   windows: clones' spans all repeat (non-first clones empty to husks),
   variants share exactly the windows their substitutions missed;
   reassembled text, n_spans, and n_removed compared per doc.

    python examples/fuzz_dedup_planted.py [--seeds 20] [--out fuzz_dedup_last.json]

tests/test_fuzz_dedup_planted.py runs a 3-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB_SIZE = 2000
N_HASHES = 64
N_BANDS = 16
EST_THRESHOLD = 0.5
# "sure thing" must be sure across the WHOLE sweep: ~300 planted pairs at
# p=0.99 would miss ~3 — the first sweep measured exactly that class (a
# p=0.993 pair missed, within theory). 0.999 keeps expected sweep misses
# well under 1 while still covering every eps<=0.02 pair (p>=0.9999).
SURE_P = 0.999
# families this tight must reassemble unconditionally: eps=0.02 over
# 80-150 tokens gives true Jaccard >=~0.85 -> banding p>=0.9999 AND an
# est_jaccard filter margin of >=6 sigma at 64 hashes. (eps=0.05 pairs
# sit near J~0.72 where banding itself has a ~1% miss rate — those
# families are only required to reassemble when their edges were in fact
# detected, which tests the components closure, not LSH luck.)
TIGHT_EPS = 0.02


def _rows(n: int) -> int:
    return N_HASHES // N_BANDS


def detect_prob(s: float) -> float:
    """Banding-theory candidate probability for true Jaccard s."""
    r, b = _rows(N_HASHES), N_BANDS
    return 1.0 - (1.0 - s**r) ** b


def true_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """TRUE n-gram Jaccard with shingles_expr semantics: whitespace
    tokenize the lowercased text, space-join n-grams, distinct."""
    sa, sb = _shingles(text_a, n), _shingles(text_b, n)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _shingles(text: str, n: int = 3) -> set:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def gen_corpus(seed: int) -> dict:
    """Deterministic corpus with planted structure.

    Returns {docs: [(doc_id, text)], exact_groups: [set(ids)],
    families: [{"ids": set, "pairs": [(id1, id2, eps)]}]}; doc_ids are
    shuffled so cluster members are never adjacent (partitioning can't
    accidentally help)."""
    rng = random.Random(seed)
    vocab = [f"w{i:04d}" for i in range(VOCAB_SIZE)]

    texts: list[str] = []
    for _ in range(40):
        n_tok = rng.randint(80, 150)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n_tok)))

    # exact groups over bases 0..5; near-dup families over bases 6..13
    exact_groups_idx: list[list[int]] = []
    families_idx: list[dict] = []
    next_idx = len(texts)
    for base in range(6):
        copies = rng.randint(1, 3)
        group = [base]
        for _ in range(copies):
            texts.append(texts[base])
            group.append(next_idx)
            next_idx += 1
        exact_groups_idx.append(group)
    for base in range(6, 14):
        eps = rng.choice([0.02, 0.05, 0.1, 0.25])
        n_var = rng.randint(1, 3)
        fam = {"idx": [base], "pairs": []}
        base_toks = texts[base].split()
        for _ in range(n_var):
            # force >=1 REAL substitution: at eps=0.02 over ~100 tokens a
            # raw Bernoulli draw is all-misses ~20% of the time, silently
            # planting an EXACT copy inside a near-dup family (the first
            # sweep's 18 "unplanted dup" flags were exactly this)
            positions = [i for i in range(len(base_toks))
                         if rng.random() < eps]
            if not positions:
                positions = [rng.randrange(len(base_toks))]
            var = list(base_toks)
            for i in positions:
                repl = rng.choice(vocab)
                while repl == var[i]:
                    repl = rng.choice(vocab)
                var[i] = repl
            texts.append(" ".join(var))
            fam["idx"].append(next_idx)
            fam["pairs"].append((base, next_idx, eps))
            next_idx += 1
        families_idx.append(fam)

    # shuffled doc_id assignment: position index -> random id
    ids = list(range(len(texts)))
    rng.shuffle(ids)
    docs = [(ids[i], texts[i]) for i in range(len(texts))]
    return {
        "docs": docs,
        "texts": texts,
        "exact_groups": [frozenset(ids[i] for i in g) for g in exact_groups_idx],
        "families": [
            {
                "ids": frozenset(ids[i] for i in fam["idx"]),
                "pairs": [
                    (ids[a], ids[b], eps, true_jaccard(texts[a], texts[b]))
                    for a, b, eps in fam["pairs"]
                ],
            }
            for fam in families_idx
        ],
    }


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
        connected_components,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        exact_dedup,
        line_dedup,
        md5_hash32,
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
        span_dedup,
        unpersist_inputs,
        winnowing_fingerprints,
    )

    corpus = gen_corpus(seed)
    docs = corpus["docs"]
    n_docs = len(docs)
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(8)
    text_of = dict(docs)
    violations: list[str] = []

    # 1. exact dedup completeness + soundness
    survivors = exact_dedup(df).select("doc_id", "n_copies").collect()
    n_clones = sum(len(g) - 1 for g in corpus["exact_groups"])
    if len(survivors) != n_docs - n_clones:
        violations.append(
            f"exact: {len(survivors)} survivors, want {n_docs - n_clones}"
        )
    by_id = {r["doc_id"]: r["n_copies"] for r in survivors}
    grouped_ids = set().union(*corpus["exact_groups"])
    for g in corpus["exact_groups"]:
        present = [i for i in g if i in by_id]
        if len(present) != 1 or by_id[present[0]] != len(g):
            violations.append(f"exact: group {sorted(g)} -> {present}")
    for doc_id, n_copies in by_id.items():
        if doc_id not in grouped_ids and n_copies != 1:
            violations.append(f"exact: unplanted dup doc {doc_id} x{n_copies}")

    # 2+3. LSH candidates vs banding theory + estimator soundness
    pairs_df = minhash_dedup_pairs(
        df, n_hashes=N_HASHES, n_bands=N_BANDS, threshold=0.0
    )
    cand = {
        (min(r["id1"], r["id2"]), max(r["id1"], r["id2"])): r["est_jaccard"]
        for r in pairs_df.collect()
    }
    unpersist_inputs(pairs_df)

    planted = [p for fam in corpus["families"] for p in fam["pairs"]]
    exp_p, var_p, hits, sure_misses = 0.0, 0.0, 0, []
    for id1, id2, eps, s in planted:
        p = detect_prob(s)
        exp_p += p
        var_p += p * (1 - p)
        key = (min(id1, id2), max(id1, id2))
        if key in cand:
            hits += 1
        elif p >= SURE_P:
            sure_misses.append((key, round(s, 3)))
    if sure_misses:
        violations.append(f"lsh: sure-thing pairs missed: {sure_misses}")
    floor = exp_p - 3.0 * math.sqrt(var_p) - 1.0
    if hits < floor:
        violations.append(
            f"lsh: recall {hits}/{len(planted)} below theory floor {floor:.2f}"
        )

    for (id1, id2), est in cand.items():
        if est >= EST_THRESHOLD:
            s = true_jaccard(text_of[id1], text_of[id2])
            if s < 0.25:
                violations.append(
                    f"lsh: est {est:.2f} but true jaccard {s:.2f} "
                    f"({id1},{id2}) — estimator unsound"
                )

    # 4. components reconstruct planted clusters
    strong = minhash_dedup_pairs(
        df, n_hashes=N_HASHES, n_bands=N_BANDS, threshold=EST_THRESHOLD
    )
    comp_df = connected_components(
        strong.select("id1", "id2"), nodes=df.select("doc_id"), id_col="doc_id"
    )
    comp = {r["doc_id"]: r["component"] for r in comp_df.collect()}
    unpersist_inputs(strong)

    detected = {k for k, est in cand.items() if est >= EST_THRESHOLD}

    clusters: list[tuple[str, frozenset]] = [
        ("exact", g) for g in corpus["exact_groups"]
    ] + [("family", fam["ids"]) for fam in corpus["families"]]
    for kind, members in clusters:
        if kind == "family":
            fam = next(f for f in corpus["families"] if f["ids"] == members)
            tight = all(eps <= TIGHT_EPS for _, _, eps, _ in fam["pairs"])
            # looser families must still reassemble whenever LSH in fact
            # surfaced every planted edge — that conditions the invariant
            # on the closure (the thing under test here), not on banding
            # luck at J~0.7 where theory itself allows ~1% misses
            all_edges_found = all(
                (min(a, b), max(a, b)) in detected
                for a, b, _, _ in fam["pairs"]
            )
        else:
            tight = all_edges_found = True
        if tight or all_edges_found:
            labels = {comp[m] for m in members}
            if len(labels) != 1:
                violations.append(
                    f"components: {kind} cluster {sorted(members)} split "
                    f"into {len(labels)} components"
                )
    # no component may span two planted clusters (cross-cluster J ~ 0)
    owner: dict = {}
    for ci, (_, members) in enumerate(clusters):
        for m in members:
            owner[m] = ci
    comp_owners: dict = {}
    for doc_id, label in comp.items():
        if doc_id in owner:
            comp_owners.setdefault(label, set()).add(owner[doc_id])
    for label, owners in comp_owners.items():
        if len(owners) > 1:
            violations.append(
                f"components: component {label} merges planted clusters "
                f"{sorted(owners)}"
            )

    # 5. SimHash determinism on clones: identical docs -> identical
    # signatures -> banded together with hamming exactly 0, always
    sh_df = simhash_near_dup_pairs(
        df, max_hamming=6, bits=32, hash_col_fn=md5_hash32
    )
    sh0 = {
        (min(r["id1"], r["id2"]), max(r["id1"], r["id2"]))
        for r in sh_df.collect() if r["hamming"] == 0
    }
    unpersist_inputs(sh_df)
    for g in corpus["exact_groups"]:
        ids = sorted(g)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if (ids[i], ids[j]) not in sh0:
                    violations.append(
                        f"simhash: exact pair ({ids[i]},{ids[j]}) not "
                        f"detected at hamming 0"
                    )

    # 6. exact n-gram Jaccard: completeness above threshold, clone pairs
    # at exactly 1.0, and every emitted score == the recomputed truth
    nj_df = ngram_jaccard_pairs(df, shingle_n=3, threshold=0.3)
    nj = {
        (min(r["id1"], r["id2"]), max(r["id1"], r["id2"])): r["jaccard"]
        for r in nj_df.collect()
    }
    unpersist_inputs(nj_df)
    for id1, id2, eps, s in planted:
        if s < 0.31:  # margin past the rounded-threshold boundary
            continue
        key = (min(id1, id2), max(id1, id2))
        got = nj.get(key)
        if got is None or abs(got - round(s, 6)) > 1e-9:
            violations.append(
                f"ngram: planted pair {key} jaccard {got} want {round(s, 6)}"
            )
    for g in corpus["exact_groups"]:
        ids = sorted(g)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if nj.get((ids[i], ids[j])) != 1.0:
                    violations.append(
                        f"ngram: clone pair ({ids[i]},{ids[j]}) jaccard "
                        f"{nj.get((ids[i], ids[j]))} != 1.0"
                    )
    for (id1, id2), got in nj.items():
        want = round(true_jaccard(text_of[id1], text_of[id2]), 6)
        if abs(got - want) > 1e-9:
            violations.append(
                f"ngram: emitted ({id1},{id2}) jaccard {got} vs truth {want}"
            )

    # 7. line_dedup vs a Python first-occurrence replay: boilerplate
    # planted into a seeded doc subset + the clones' repeated content lines
    rng2 = random.Random(seed ^ 0xB011)
    boiler = "boilerplate " + " ".join(
        f"b{rng2.randrange(100):02d}" for _ in range(10)
    )
    with_boiler = set(rng2.sample(sorted(text_of), 8))
    lined = [
        (i, text_of[i] + ("\n" + boiler if i in with_boiler else ""))
        for i in sorted(text_of)
    ]
    seen_lines: set = set()
    expect = {}
    for i, t in lined:  # ascending doc_id, lines in order == global
        kept_parts, removed = [], 0  # first-occurrence (doc_id, line_idx)
        for line in t.split("\n"):
            if len(line.strip()) >= 1:
                if line in seen_lines:
                    removed += 1
                else:
                    seen_lines.add(line)
                    kept_parts.append(line)
            else:
                kept_parts.append(line)
        expect[i] = ("\n".join(kept_parts), len(t.split("\n")), removed)
    ld = line_dedup(
        spark.createDataFrame(lined, ["doc_id", "text"]).repartition(8),
        dedup_key="text",
    )
    for r in ld.collect():
        want_text, want_lines, want_removed = expect[r["doc_id"]]
        if (r["text"], r["n_lines"], r["n_removed"]) != (
            want_text, want_lines, want_removed
        ):
            violations.append(
                f"line_dedup: doc {r['doc_id']} "
                f"(n_lines {r['n_lines']} vs {want_lines}, "
                f"n_removed {r['n_removed']} vs {want_removed}, "
                f"text_match {r['text'] == want_text})"
            )

    # 8. winnowing: the k+w-1 guarantee on a planted shared run, and
    # fingerprint-set identity on clones
    x_toks = [f"x{rng2.randrange(10**6):06d}" for _ in range(60)]
    y_toks = (
        [f"y{rng2.randrange(10**6):06d}" for _ in range(25)]
        + x_toks[10:40]
        + [f"y{rng2.randrange(10**6):06d}" for _ in range(15)]
    )
    wdf = spark.createDataFrame(
        [(900001, " ".join(x_toks)), (900002, " ".join(y_toks))],
        ["doc_id", "text"],
    )
    wp: dict = {}
    for r in winnowing_fingerprints(wdf, k=8, w=4).collect():
        wp.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    if not (wp.get(900001, set()) & wp.get(900002, set())):
        violations.append(
            "winnowing: planted 30-token shared run produced no shared "
            "fingerprint (violates the k+w-1 guarantee)"
        )
    g0 = min(corpus["exact_groups"], key=lambda g: min(g))
    cf: dict = {}
    for r in winnowing_fingerprints(
        df.filter(F.col("doc_id").isin([int(i) for i in g0])), k=8, w=4
    ).collect():
        cf.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    if len({frozenset(v) for v in cf.values()}) != 1 or len(cf) != len(g0):
        violations.append(
            f"winnowing: clone group {sorted(g0)} fingerprint sets differ"
        )

    # 9. span_dedup vs a Python first-occurrence replay over 50-token
    # windows (clones repeat every span; variants share the untouched ones)
    span_expect = {}
    seen_spans: set = set()
    for i in sorted(text_of):
        toks = text_of[i].split()
        spans = [" ".join(toks[k : k + 50]) for k in range(0, len(toks), 50)]
        kept_spans, removed = [], 0
        for sp in spans:
            if sp in seen_spans:
                removed += 1
            else:
                seen_spans.add(sp)
                kept_spans.append(sp)
        span_expect[i] = (" ".join(kept_spans), len(spans), removed)
    sd = span_dedup(df, span_tokens=50, dedup_key="text")
    for r in sd.collect():
        want_text, want_spans, want_removed = span_expect[r["doc_id"]]
        if (r["text"], r["n_spans"], r["n_removed"]) != (
            want_text, want_spans, want_removed
        ):
            violations.append(
                f"span_dedup: doc {r['doc_id']} "
                f"(n_spans {r['n_spans']} vs {want_spans}, "
                f"n_removed {r['n_removed']} vs {want_removed}, "
                f"text_match {r['text'] == want_text})"
            )

    return {
        "seed": seed,
        "n_docs": n_docs,
        "n_planted_pairs": len(planted),
        "lsh_hits": hits,
        "lsh_theory_floor": round(floor, 2),
        "n_simhash_zero_pairs": len(sh0),
        "n_ngram_pairs": len(nj),
        "line_dedup_docs_touched": sum(
            1 for i in expect if expect[i][2] > 0
        ),
        "span_dedup_docs_touched": sum(
            1 for i in span_expect if span_expect[i][2] > 0
        ),
        "violations": violations,
    }


def run(seeds, log=print) -> dict:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-dedup", shuffle_partitions=8)
    results = []
    for seed in seeds:
        rec = check_corpus(spark, seed)
        results.append(rec)
        log(
            f"# seed {seed}: docs={rec['n_docs']} "
            f"recall={rec['lsh_hits']}/{rec['n_planted_pairs']} "
            f"(floor {rec['lsh_theory_floor']}) "
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
        "fuzz_dedup_last.json"))
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
