"""Text-quality scalar family against PLANTED ground truth (round 13).

`language_id`, `quality_score`, `repetition_stats(_batch)`, `script_ratios`,
and `char_entropy_batch` feed doc_quality_report and the curation queries;
their oracles replay the same arithmetic in SQL (shared lineage — VERDICT
r12 item 5). This harness constructs texts whose scores follow from the
construction alone:

1. LANGUAGE ID — token streams assembled from a SPEC copy of the engine's
   stopword lists with exact per-language hit counts: clear winners,
   deliberate cross-language tokens ('la' hits fr AND es), the exact-tie
   broken by fixed language order, case-folded hits, zero-hit -> 'und',
   and empty/NULL -> 'und'. If the engine's lists drift from the spec the
   fuzzer fails loudly.
2. QUALITY SCORE — each component pinned by construction: char counts at
   25 (ramp 0.5) and >= 50 (capped 1.0); mean token length exactly 3 / 12
   (in-range) and 2 / 13 (out); alphanumeric ratio from a planted
   punctuation count; empty text scores 0.
3. REPETITION — token multisets with known distinct/total/top counts
   (dup_token_ratio, top_token_ratio closed-form) and consecutive-pair
   sets counted by construction (dup_bigram_ratio); case-folding planted;
   the batch twin must equal the per-row column on the same corpus and be
   partitioning-invariant.
4. SCRIPT RATIOS — strings with exact Latin/Cyrillic/Han letter counts
   diluted by digits/punct (ratios over LETTERS only), the letterless doc
   (0.0 everywhere), and NULL text -> NULL ratios.
5. CHAR ENTROPY — dyadic-rational plants exact in binary AND decimal:
   uniform 2^k alphabets (k bits), counts (2,1,1) -> 1.5, (4,2,1,1) ->
   1.75, single-char floods -> 0.0, empty/NULL -> 0.0 with n_chars 0.
   Shuffled character order must not change the histogram.
6. COMPRESSION — monotonicity only (no closed form): a 1000-char flood
   compresses far below varied text; empty -> NULL; deterministic rerun.

    python examples/fuzz_textquality_planted.py [--seeds 20]
                                    [--out fuzz_textquality_last.json]

tests/test_fuzz_textquality_planted.py runs a 2-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SPEC copy of the engine's stopword lists (functions/textstats.py) — the
# fuzzer's expectations are computed against THIS table, so a silent list
# drift in the engine fails here instead of being mirrored.
SPEC_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
    "vi": ("và", "là", "của", "không", "có", "một", "những", "được"),
}
LANG_ORDER = ("en", "de", "fr", "es", "vi")


def expected_lang(tokens: list[str]) -> str:
    hits = {
        lang: sum(1 for t in tokens if t.lower() in SPEC_STOPWORDS[lang])
        for lang in LANG_ORDER
    }
    best = max(LANG_ORDER, key=lambda l: (hits[l], -LANG_ORDER.index(l)))
    return best if hits[best] > 0 else "und"


def expected_quality(text: str) -> float:
    compact = "".join(text.split())
    n_chars = len(text)
    n_tokens = len(text.split())
    n_alpha = sum(1 for ch in compact if ch.isalnum())
    length_score = min(1.0, n_chars / 50.0)
    mean_tok = (len(compact) / n_tokens) if n_tokens else 0.0
    token_score = 1.0 if 3.0 <= mean_tok <= 12.0 else 0.0
    alpha_ratio = (n_alpha / len(compact)) if compact else 0.0
    return (length_score + token_score + alpha_ratio) / 3.0


def expected_repetition(text: str) -> tuple[float, float, float]:
    toks = [t.lower() for t in text.split()]
    n = len(toks)
    if n == 0:
        return (0.0, 0.0, 0.0)
    nd = len(set(toks))
    bigrams = list(zip(toks, toks[1:]))
    dup_bg = (1.0 - len(set(bigrams)) / len(bigrams)) if bigrams else 0.0
    top = max(toks.count(t) for t in set(toks))
    return (1.0 - nd / n, dup_bg, top / n)


def expected_entropy(counts: list[int]) -> float:
    n = sum(counts)
    if n == 0:
        return 0.0
    h = math.log2(n) - sum(c * math.log2(c) for c in counts) / n
    return math.floor(h * 1e6 + 0.5) / 1e6  # HALF_UP like F.round


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
        char_entropy_batch,
        compression_ratio_udf,
        language_id,
        quality_score,
        repetition_stats,
        repetition_stats_batch,
        script_ratios,
    )

    rng = random.Random(seed)
    violations: list[str] = []
    uid = [0]

    def noise(k: int) -> list[str]:
        uid[0] += k
        return [f"zq{seed}x{uid[0] - k + j}" for j in range(k)]

    # --- 1. language id ----------------------------------------------
    lang_docs: list[tuple[int, str | None]] = []
    a, b = rng.sample(LANG_ORDER, 2)
    na, nb = rng.randint(3, 6), rng.randint(1, 2)
    toks = (list(rng.choices(SPEC_STOPWORDS[a], k=na))
            + list(rng.choices(SPEC_STOPWORDS[b], k=nb)) + noise(4))
    rng.shuffle(toks)
    lang_docs.append((0, " ".join(toks)))                       # clear winner
    t1, t2 = LANG_ORDER[1], LANG_ORDER[3]                        # de vs es tie
    tie = [SPEC_STOPWORDS[t1][0]] * 2 + [SPEC_STOPWORDS[t2][0]] * 2 + noise(3)
    rng.shuffle(tie)
    lang_docs.append((1, " ".join(tie)))                         # earlier wins
    lang_docs.append((2, " ".join(noise(6))))                    # und
    lang_docs.append((3, ""))                                    # und
    lang_docs.append((4, None))                                  # und
    lang_docs.append((5, " ".join(w.upper() for w in SPEC_STOPWORDS["en"][:4])
                      + " " + " ".join(noise(2))))               # case-folded
    lang_docs.append((6, "la la la " + " ".join(noise(2))))      # fr|es cross:
    # 'la' hits fr AND es equally -> fr (earlier in order) wins

    ldf = spark.createDataFrame(lang_docs, "doc_id long, text string")
    got_l = {r["doc_id"]: r["lang"]
             for r in ldf.select("doc_id", language_id("text").alias("lang")).collect()}
    for i, t in lang_docs:
        want = expected_lang((t or "").split())
        if got_l[i] != want:
            violations.append(f"lang/doc{i}: {got_l[i]} != {want} ({t!r})")

    # --- 2. quality score --------------------------------------------
    q_docs = [
        (0, "abcde abcde abcde abcd"),        # 22 chars, mean tok 4.75 -> in
        (1, "ab " * 30),                      # mean 2 -> token_score 0
        (2, "abc def!! gh1 jkl mno pqr stu vwx yz0 a2c d4f g6h"),  # punct mix
        (3, ("abc " * 13).strip()),           # 51 chars -> ramp capped 1.0
        (4, "abcdefghijkl " * 4),             # mean exactly 12 -> in-range
        (5, "abcdefghijklm " * 4),            # mean exactly 13 -> out
        (6, ""),                              # 0.0
        (7, "!!! ??? ;;; ::: ..."),           # alpha ratio 0
    ]
    qdf = spark.createDataFrame(q_docs, "doc_id long, text string")
    got_q = {r["doc_id"]: r["q"]
             for r in qdf.select("doc_id", quality_score("text").alias("q")).collect()}
    for i, t in q_docs:
        want = expected_quality(t)
        if abs(got_q[i] - want) > 1e-9:
            violations.append(f"quality/doc{i}: {got_q[i]} != {want}")

    # --- 3. repetition ------------------------------------------------
    base = noise(3)
    rep_docs = [
        (0, " ".join(["dup"] * 5 + base)),    # n=8 nd=4: ratio .5, top 5/8
        (1, " ".join((base + ["dup"]) * 3)),  # repeated line: known bigrams
        (2, "Mix mix MIX " + " ".join(noise(1))),  # case-folded dup
        (3, " ".join(noise(6))),              # all-distinct: zeros
        (4, "solo"),                          # single token: no bigrams
        (5, ""),                              # zeros
    ]
    rdf = spark.createDataFrame(rep_docs, "doc_id long, text string")
    got_r = {r["doc_id"]: (r["s"]["dup_token_ratio"], r["s"]["dup_bigram_ratio"],
                           r["s"]["top_token_ratio"])
             for r in rdf.select("doc_id", repetition_stats("text").alias("s")).collect()}
    for i, t in rep_docs:
        want = expected_repetition(t)
        if any(abs(g - w) > 1e-9 for g, w in zip(got_r[i], want)):
            violations.append(f"repetition/doc{i}: {got_r[i]} != {want}")
    # batch twin: equal to the per-row column, partitioning-invariant
    for parts in (2, 7):
        got_b = {r["doc_id"]: (r["dup_token_ratio"], r["dup_bigram_ratio"],
                               r["top_token_ratio"])
                 for r in repetition_stats_batch(rdf.repartition(parts)).collect()}
        for i, _ in rep_docs:
            if any(abs(g - w) > 1e-9 for g, w in zip(got_b[i], got_r[i])):
                violations.append(
                    f"repetition_batch/p{parts}/doc{i}: {got_b[i]} != {got_r[i]}")

    # --- 4. script ratios ----------------------------------------------
    # exact letter counts: latin 'abc', cyrillic 'где', han '中文' + dilution
    s_docs = [
        (0, "abc где 中文 123!"),   # 8 letters: 3/8, 3/8, 2/8
        (1, "abcd"),                # all latin: 1, 0, 0
        (2, "123 !!! ..."),         # letterless: 0.0s with n_letters 0
        (3, None),                  # NULL text -> NULL ratios
        (4, "яя xx 中中中中"),       # 2 cyr, 2 lat, 4 han of 8
    ]
    want_s = {
        0: (8, 0.375, 0.375, 0.25),
        1: (4, 1.0, 0.0, 0.0),
        2: (0, 0.0, 0.0, 0.0),
        3: (None, None, None, None),
        4: (8, 0.25, 0.25, 0.5),
    }
    sdf = spark.createDataFrame(s_docs, "doc_id long, text string")
    got_s = {r["doc_id"]: (r["s"]["n_letters"], r["s"]["latin_ratio"],
                           r["s"]["cyrillic_ratio"], r["s"]["han_ratio"])
             for r in sdf.select("doc_id", script_ratios("text").alias("s")).collect()}
    for i, want in want_s.items():
        got = got_s[i]
        ok = all(
            (g is None and w is None)
            or (g is not None and w is not None and abs(g - w) <= 1e-9)
            for g, w in zip(got, want)
        )
        if not ok:
            violations.append(f"script/doc{i}: {got} != {want}")

    # --- 5. char entropy ------------------------------------------------
    def flood(counts: dict[str, int]) -> str:
        chars = [ch for ch, c in counts.items() for _ in range(c)]
        rng.shuffle(chars)  # histogram, not order, determines entropy
        return "".join(chars)

    m = rng.randint(2, 5)
    e_docs = [
        (0, "a" * rng.randint(2, 40), [rng.randint(2, 40)]),
        (1, flood({"a": 2 * m, "b": 2 * m}), [2 * m, 2 * m]),          # 1 bit
        (2, flood({"a": m, "b": m, "c": m, "d": m}), [m] * 4),         # 2 bits
        (3, flood({"x": 2, "y": 1, "z": 1}), [2, 1, 1]),               # 1.5
        (4, flood({"p": 4, "q": 2, "r": 1, "s": 1}), [4, 2, 1, 1]),    # 1.75
        (5, "", []),
        (6, None, []),
    ]
    # fix doc0's count to its actual length
    e_docs[0] = (0, e_docs[0][1], [len(e_docs[0][1])])
    edf = spark.createDataFrame([(i, t) for i, t, _ in e_docs],
                                "doc_id long, text string")
    got_e = {r["doc_id"]: (r["n_chars"], r["entropy"])
             for r in char_entropy_batch(edf).collect()}
    for i, t, counts in e_docs:
        want = (sum(counts), expected_entropy(counts))
        if got_e[i][0] != want[0] or abs(got_e[i][1] - want[1]) > 1e-9:
            violations.append(f"entropy/doc{i}: {got_e[i]} != {want}")

    # --- 6. compression (monotonicity only) ------------------------------
    varied = " ".join(noise(150))
    cdf = spark.createDataFrame(
        [(0, "a" * 1000), (1, varied), (2, "")], "doc_id long, text string")
    ratio = compression_ratio_udf()
    got_c = {r["doc_id"]: r["r"]
             for r in cdf.select("doc_id", ratio("text").alias("r")).collect()}
    if not (got_c[0] is not None and got_c[0] < 0.1):
        violations.append(f"compression: flood ratio {got_c[0]} not << 1")
    if not (got_c[1] is not None and got_c[1] > got_c[0]):
        violations.append(f"compression: varied {got_c[1]} <= flood {got_c[0]}")
    if got_c[2] is not None:
        violations.append(f"compression: empty text gave {got_c[2]}, want NULL")

    return {
        "seed": seed,
        "lang_winner": (a, na, b, nb),
        "entropy_m": m,
        "violations": violations,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_textquality_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-textquality", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} winner={rec['lang_winner']}",
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
