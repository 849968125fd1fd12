"""Retrieval fuzzer against PLANTED ground truth (VERDICT r11 item 5).

BM25/hybrid-RRF was the last operator family whose correctness rested only
on the fixed-testdata DuckDB oracle. Like the dedup and ANN planted
fuzzers, this harness GENERATES corpora with known structure — controlled
query-term frequencies, document lengths, and document frequencies — and
asserts the operators recover the ranking that retrieval theory
prescribes, plus match an independent first-principles Python replay
exactly.

Per seeded corpus (deterministic ``random.Random(seed)``, no wall clock):

* 50 noise docs of 50-150 tokens from a 2000-word background vocab that is
  DISJOINT from the query terms, so a doc's query-term tf is exactly what
  was planted. A seeded ~40% of noise docs carry one ``qcharlie`` token —
  making it the COMMON query term (high df, low idf) while ``qalpha``
  stays rare.
* 12 planted relevant docs with chosen per-term tf in 0..3 and target
  lengths in {60, 100, 140}, plus three engineered DOMINANCE pairs:
  tf-dominance (same length, one extra ``qalpha`` occurrence), length
  normalization (same tf vector, shorter doc), and idf-dominance (same
  length, tf=1 on the rare term vs tf=1 on the common term).

Invariants asserted (violations -> exit 1, recorded per seed):

1. EXACT replay: ``bm25_topk``'s (doc_id, score) list — values, order,
   and cutoff — equals a from-first-principles Python computation of the
   Lucene-idf Okapi formula over the planted postings (N and avgdl over
   all tokenized docs, df per term, round 6, (score desc, id asc) total
   order). No probabilistic slack: the operator is exact or it is wrong.
2. SOUNDNESS: no returned doc lacks query terms; COMPLETENESS: the top-k
   of the replay is exactly what is returned (implied by 1, asserted
   separately so a truncation bug reads as itself).
3. tf-DOMINANCE: the engineered pair with one extra ``qalpha`` scores
   strictly higher (same length, same other tfs — BM25's per-term weight
   is strictly increasing in tf).
4. LENGTH NORMALIZATION: the engineered same-tf shorter doc scores
   strictly higher (b = 0.75 > 0).
5. idf-DOMINANCE: tf=1 on the planted-rare term beats tf=1 on the
   planted-common term at equal length (df_rare < df_common by
   construction, and Lucene idf is strictly decreasing in df).
6. RRF EXACT replay: ``rrf_fuse`` of the BM25 leg and a seeded synthetic
   dense leg equals the Python fused scores (round 9), order and cutoff
   included.
7. RRF DUAL-PRESENCE THEOREM: with k0 = 60 and leg depth m <= 20, a doc
   present in BOTH legs scores >= 2/(k0+m) = 0.025 > 1/(k0+1) ~ 0.0164 >=
   any single-leg doc's score — so every dual-presence doc must outrank
   every single-presence doc in the fused ranking. The synthetic leg is
   built to overlap the BM25 leg (10 shared + 10 noise-only docs) so the
   theorem is never vacuous.
8. RRF CONSENSUS: in the ~half of seeds where the synthetic leg's rank 1
   is pinned to the BM25 leg's rank-1 doc, that doc must be fused rank 1
   (2/(k0+1) is the maximum achievable fused score and is unique to it).

    python examples/fuzz_retrieval_planted.py [--seeds 20]
                                              [--out fuzz_retrieval_last.json]

tests/test_fuzz_retrieval_planted.py runs a 3-seed slice per session.
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
QUERY_TERMS = ["qalpha", "qbravo", "qcharlie"]  # disjoint from background vocab
K1, B = 1.2, 0.75
K0 = 60          # rrf_fuse default
LEG_DEPTH = 20   # both fusion legs are top-20
BM25_K = 15


def bm25_replay(docs: list, terms: list, top_k: int) -> list:
    """First-principles (doc_id, score) top-k: Lucene-idf Okapi BM25 with
    the operator's corpus-stat conventions (N/avgdl over docs with >= 1
    token, OR semantics, set-deduped query terms, round 6, (score desc,
    id asc) total order)."""
    terms = sorted({t.lower() for t in terms})
    toks = {i: t.lower().split() for i, t in docs}
    lens = {i: len(tk) for i, tk in toks.items() if tk}
    n_docs = len(lens)
    avgdl = sum(lens.values()) / n_docs
    tf = {i: {t: tk.count(t) for t in terms if t in tk} for i, tk in toks.items()}
    df = {t: sum(1 for i in tf if t in tf[i]) for t in terms}
    scored = []
    for i, per_term in tf.items():
        if not per_term:
            continue
        s = 0.0
        for t, f in per_term.items():
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (f * (K1 + 1)) / (f + K1 * (1 - B + B * lens[i] / avgdl))
        scored.append((i, round(s, 6)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:top_k]


def rrf_replay(rankings: list, top_k: int) -> list:
    """(doc_id, rrf_score, rnk) replay of rrf_fuse: 1/(k0+rank) per leg,
    summed, round 9, (score desc, id asc) row_number, top_k."""
    acc: dict = {}
    for ranks in rankings:
        for doc_id, rnk in ranks:
            acc[doc_id] = acc.get(doc_id, 0.0) + 1.0 / (K0 + rnk)
    rows = sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:top_k]
    return [(i, round(s, 9), r + 1) for r, (i, s) in enumerate(rows)]


def gen_corpus(seed: int) -> dict:
    """Deterministic corpus with planted term statistics.

    Returns {docs: [(doc_id, text)], dominance: {"tf": (hi, lo),
    "len": (short, long), "idf": (rare, common)}, pin_consensus: bool,
    relevant_ids: set}; doc ids are shuffled so planted docs are never
    adjacent."""
    rng = random.Random(seed)
    vocab = [f"w{i:04d}" for i in range(VOCAB_SIZE)]

    def make_doc(n_filler: int, term_tfs: dict) -> str:
        toks = [rng.choice(vocab) for _ in range(n_filler)]
        for t, f in term_tfs.items():
            toks += [t] * f
        rng.shuffle(toks)
        return " ".join(toks)

    texts: list[str] = []
    meta: list[dict] = []  # parallel: planted tf vector (for reporting)

    # noise docs; a seeded subset carries one common-term token
    for _ in range(50):
        tfs = {"qcharlie": 1} if rng.random() < 0.4 else {}
        n = rng.randint(50, 150)
        texts.append(make_doc(n - sum(tfs.values()), tfs))
        meta.append(tfs)

    relevant_idx = []
    for _ in range(12):
        tfs = {t: rng.randint(0, 3) for t in QUERY_TERMS}
        if not any(tfs.values()):
            tfs["qbravo"] = 1
        length = rng.choice([60, 100, 140])
        texts.append(make_doc(length - sum(tfs.values()), tfs))
        meta.append(tfs)
        relevant_idx.append(len(texts) - 1)

    # engineered dominance pairs (same construction length L)
    L = 100
    base_tfs = {"qalpha": 1, "qbravo": 2}
    hi_tfs = {"qalpha": 2, "qbravo": 2}
    tf_lo = len(texts)
    texts.append(make_doc(L - sum(base_tfs.values()), base_tfs))
    meta.append(base_tfs)
    tf_hi = len(texts)
    texts.append(make_doc(L - sum(hi_tfs.values()), hi_tfs))
    meta.append(hi_tfs)

    len_short = len(texts)
    texts.append(make_doc(60 - sum(base_tfs.values()), base_tfs))
    meta.append(base_tfs)
    len_long = len(texts)
    texts.append(make_doc(140 - sum(base_tfs.values()), base_tfs))
    meta.append(base_tfs)

    idf_rare = len(texts)
    texts.append(make_doc(L - 1, {"qalpha": 1}))
    meta.append({"qalpha": 1})
    idf_common = len(texts)
    texts.append(make_doc(L - 1, {"qcharlie": 1}))
    meta.append({"qcharlie": 1})

    ids = list(range(len(texts)))
    rng.shuffle(ids)
    docs = [(ids[i], texts[i]) for i in range(len(texts))]
    return {
        "docs": docs,
        "dominance": {
            "tf": (ids[tf_hi], ids[tf_lo]),
            "len": (ids[len_short], ids[len_long]),
            "idf": (ids[idf_rare], ids[idf_common]),
        },
        "relevant_ids": {ids[i] for i in relevant_idx},
        "pin_consensus": rng.random() < 0.5,
        "rng_state_seed": seed,
    }


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )

    corpus = gen_corpus(seed)
    docs = corpus["docs"]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(8)
    violations: list[str] = []

    # 1+2. exact replay of the full BM25 list (values, order, cutoff)
    got = [(r["doc_id"], r["score"])
           for r in bm25_topk(df, QUERY_TERMS, top_k=BM25_K).collect()]
    want = bm25_replay(docs, QUERY_TERMS, top_k=BM25_K)
    if got != want:
        diffs = [(a, b) for a, b in zip(got, want) if a != b][:4]
        violations.append(f"bm25: got != replay, first diffs {diffs}")
    term_set = set(QUERY_TERMS)
    text_of = dict(docs)
    for doc_id, _ in got:
        if not term_set & set(text_of[doc_id].split()):
            violations.append(f"bm25: doc {doc_id} returned without any query term")

    # 3-5. dominance invariants on the FULL scored list (the engineered
    # pairs may fall below the top-k line, so replay without a cutoff)
    full = dict(bm25_replay(docs, QUERY_TERMS, top_k=10**9))
    spark_full = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, QUERY_TERMS, top_k=10**6).collect()
    }
    checks = 0
    for kind, (better, worse) in corpus["dominance"].items():
        for src, scores in (("replay", full), ("spark", spark_full)):
            if scores.get(better, 0.0) <= scores.get(worse, 0.0):
                violations.append(
                    f"{kind}-dominance ({src}): doc {better} "
                    f"{scores.get(better)} <= doc {worse} {scores.get(worse)}")
            checks += 1

    # 6-8. RRF: BM25 leg (top-20 ranks) + seeded synthetic dense leg that
    # overlaps it (10 shared + 10 noise-only docs), optionally consensus-
    # pinned at rank 1
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = bm25_topk(df, QUERY_TERMS, top_k=LEG_DEPTH).withColumn(
        "rnk", F.row_number().over(w)).select("doc_id", "rnk")
    bm_ranks = [(r["doc_id"], r["rnk"]) for r in bm.collect()]
    bm_ids = [i for i, _ in sorted(bm_ranks, key=lambda x: x[1])]

    rng = random.Random(seed ^ 0x9E7A11)
    shared = rng.sample(bm_ids, min(10, len(bm_ids)))
    no_terms = [i for i, t in docs
                if not term_set & set(t.split()) and i not in shared]
    leg2_ids = shared + rng.sample(no_terms, LEG_DEPTH - len(shared))
    rng.shuffle(leg2_ids)
    if corpus["pin_consensus"]:
        top_bm = bm_ids[0]
        if top_bm in leg2_ids:
            leg2_ids.remove(top_bm)
        else:
            leg2_ids.pop()
        leg2_ids.insert(0, top_bm)
    leg2_ranks = [(i, r + 1) for r, i in enumerate(leg2_ids)]
    leg2 = spark.createDataFrame(leg2_ranks, ["doc_id", "rnk"])

    fused = [(r["doc_id"], r["rrf_score"], r["rnk"])
             for r in rrf_fuse([bm, leg2], top_k=BM25_K).collect()]
    fused_want = rrf_replay([bm_ranks, leg2_ranks], top_k=BM25_K)
    if fused != fused_want:
        diffs = [(a, b) for a, b in zip(fused, fused_want) if a != b][:4]
        violations.append(f"rrf: got != replay, first diffs {diffs}")

    dual = {i for i, _ in bm_ranks} & {i for i, _ in leg2_ranks}
    # ADVICE r12: a dual doc pushed out of the top-k entirely would be
    # invisible to the rank comparison below — require every dual doc to be
    # IN the fused output first (legs are depth 20 with k=60, so the worst
    # dual score 2/(60+20) beats the best single score 1/(60+1); the fused
    # top-k must hold all dual docs up to its capacity).
    fused_ids = {i for i, _, _ in fused}
    if len(dual & fused_ids) != min(len(dual), BM25_K):
        violations.append(
            f"rrf dual-presence theorem: {sorted(dual - fused_ids)} "
            f"dual-leg docs missing from the fused top-{BM25_K}")
    worst_dual_rank = max((rnk for i, _, rnk in fused if i in dual), default=0)
    best_single_rank = min((rnk for i, _, rnk in fused if i not in dual),
                           default=10**9)
    if worst_dual_rank > 0 and best_single_rank < worst_dual_rank:
        violations.append(
            f"rrf dual-presence theorem: single-leg doc at rank "
            f"{best_single_rank} above dual-leg doc at {worst_dual_rank}")
    if corpus["pin_consensus"] and fused and fused[0][0] != bm_ids[0]:
        violations.append(
            f"rrf consensus: both legs rank doc {bm_ids[0]} first but fused "
            f"rank 1 is {fused[0][0]}")

    return {
        "seed": seed,
        "n_docs": len(docs),
        "n_scored": len(spark_full),
        "bm25_topk": len(got),
        "dominance_checks": checks,
        "n_dual_presence": len(dual),
        "consensus_pinned": corpus["pin_consensus"],
        "violations": violations,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_retrieval_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-retrieval", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} "
              f"(dual={rec['n_dual_presence']}, "
              f"consensus={rec['consensus_pinned']})", file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    n_consensus = sum(1 for r in records if r["consensus_pinned"])
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "dominance_checks": sum(r["dominance_checks"] for r in records),
        "dual_presence_total": sum(r["n_dual_presence"] for r in records),
        "consensus_pinned_seeds": n_consensus,
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
