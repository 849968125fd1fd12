"""PII redaction against PLANTED ground truth (round 13).

`pii_counts` / `redact_pii` / `redact_pii_with_counts` (functions/pii.py)
run pure-Catalyst regex passes, and the `doc_pii_redact` oracle replays
the SAME patterns verbatim in DuckDB — shared lineage: a wrong or drifted
pattern satisfies both engines at once. This harness constructs documents
as SEGMENT LISTS where every segment carries its own expected redaction
and per-kind count delta; the expected document-level counts and the
fully-redacted string are assembled from the construction alone (string
concatenation — no regex is ever executed to produce an expectation).

Planted families per seed:

1. RANDOM SEGMENT DOCS — each doc is a space-joined sequence of noise
   runs (lowercase letters only: provably matchless), emails (random
   local parts over the legal charset, incl. dots/+/%), phones
   (+1..3-digit CC, 3, 3-4, optional 3-4 groups), and syntactic IPv4s
   (1-3 digit octets — values past 255 match by design: the pattern is
   documented as syntactic). Expected counts = planted counts; expected
   redacted = join of per-segment redactions.
2. SEQUENTIAL-SEMANTICS PLANTS — the contract `pii_counts` documents:
   an IPv4 as an email local part ('1.2.3.4@host.tld') is ONE email and
   ZERO ipv4; a phone-shaped local part ('+1-234-567@host.tld') is ONE
   email and ZERO phone. Raw per-kind counting would report the phantom
   second match; the plant fails if the sequential chain regresses.
3. BOUNDARY / ADJACENCY PLANTS — trailing sentence punctuation
   ('a@b.co.' -> '[EMAIL].'), comma-glued email,ip pair
   ('a@b.co,1.2.3.4' -> '[EMAIL],[IP]'), the five-octet run
   ('1.2.3.4.5' -> '[IP].5', leftmost match), and the overlong last
   phone group ('+1-234-567-89012' -> '[PHONE]2' — the optional group
   takes 4 digits greedily, no trailing anchor by design).
4. NEAR-MISSES that must NOT match (redacted == original, counts 0):
   'user@domain' (no dot-TLD), 'a@b.c' (1-char TLD), '@x.com' (empty
   local part), '1-234-567' (no '+'), '+1234-567-890' (4-digit CC),
   '1.2.3' (three octets), '1.2.3.4567' (word boundary inside the
   digit run kills every backtrack).
5. CONTRACTS — NULL text: counts (0,0,0), redacted NULL; empty text:
   counts (0,0,0), redacted ''. `redact_pii(kinds=())` is identity;
   `redact_pii(kinds=('email',))` equals the construction with ONLY
   email segments swapped.
6. TWIN + PARTITIONING INVARIANCE — `redact_pii_with_counts` (the
   staged batch API) must equal the single-Column `pii_counts` /
   `redact_pii` composition row-for-row, under repartition(3) and (7).

    python examples/fuzz_pii_planted.py [--seeds 20]
                                        [--out fuzz_pii_last.json]

tests/test_fuzz_pii_planted.py runs a 2-seed slice per session and pins
the engine's pattern table against a spec copy so drift fails by name.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SPEC copy of the engine's tag table (functions/pii.py). Expectations are
# assembled from THESE strings; the slice test pins the engine table to
# this copy so a silent tag rename fails by name, not by fuzz seed.
SPEC_TAGS = {"email": "[EMAIL]", "phone": "[PHONE]", "ipv4": "[IP]"}

LOCAL_CHARS = string.ascii_letters + string.digits + "._%+-"


def gen_noise(rng: random.Random, k: int) -> str:
    """Lowercase-letter words: no digit, '@', '+', or '.' anywhere, so no
    PII pattern can match inside or across them."""
    return " ".join(
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 9)))
        for _ in range(k)
    )


def gen_email(rng: random.Random) -> str:
    local = "".join(rng.choices(LOCAL_CHARS, k=rng.randint(1, 12)))
    host = "".join(rng.choices(string.ascii_lowercase + string.digits,
                               k=rng.randint(1, 8)))
    tld = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 4)))
    return f"{local}@{host}.{tld}"


def gen_phone(rng: random.Random) -> str:
    cc = rng.randint(1, 999)
    g1 = rng.randint(100, 999)
    g2 = rng.randint(100, 9999)
    s = f"+{cc}-{g1}-{g2}"
    if rng.random() < 0.5:
        s += f"-{rng.randint(100, 9999)}"
    return s


def gen_ipv4(rng: random.Random) -> str:
    return ".".join(str(rng.randint(0, 999)) for _ in range(4))


def build_random_doc(rng: random.Random) -> tuple[str, str, dict]:
    """Return (text, expected_redacted, expected_counts) assembled from
    segments; expectations are pure string concatenation."""
    segs: list[tuple[str, str]] = []  # (raw, redacted)
    counts = {"email": 0, "phone": 0, "ipv4": 0}
    for _ in range(rng.randint(2, 8)):
        kind = rng.choice(["noise", "noise", "email", "phone", "ipv4"])
        if kind == "noise":
            w = gen_noise(rng, rng.randint(1, 4))
            segs.append((w, w))
        else:
            raw = {"email": gen_email, "phone": gen_phone,
                   "ipv4": gen_ipv4}[kind](rng)
            segs.append((raw, SPEC_TAGS[kind]))
            counts[kind] += 1
    text = " ".join(r for r, _ in segs)
    redacted = " ".join(x for _, x in segs)
    return text, redacted, counts


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.pii import (
        pii_counts,
        redact_pii,
        redact_pii_with_counts,
    )

    rng = random.Random(791000 + seed)
    violations: list[str] = []

    docs: list[tuple[int, str | None]] = []
    # (counts, redacted); None redacted means "expect NULL"
    want: dict[int, tuple[dict, str | None]] = {}
    # per-doc expectation for redact_pii(kinds=("email",)) — only set for
    # docs whose email-only redaction is known from construction
    want_email_only: dict[int, str] = {}

    # --- 1. random segment docs --------------------------------------
    i = 0
    for _ in range(rng.randint(4, 7)):
        text, red, cnt = build_random_doc(rng)
        docs.append((i, text))
        want[i] = (cnt, red)
        i += 1

    # one random doc with a tracked email-only expectation
    segs = []
    em = gen_email(rng)
    ph = gen_phone(rng)
    ip = gen_ipv4(rng)
    nz = gen_noise(rng, 2)
    text = f"{nz} {em} {ph} {ip}"
    docs.append((i, text))
    want[i] = ({"email": 1, "phone": 1, "ipv4": 1},
               f"{nz} [EMAIL] [PHONE] [IP]")
    want_email_only[i] = f"{nz} [EMAIL] {ph} {ip}"
    i += 1

    # --- 2. sequential-semantics plants ------------------------------
    o = [rng.randint(1, 255) for _ in range(4)]
    ip_local = f"{o[0]}.{o[1]}.{o[2]}.{o[3]}@host{seed}.com"
    docs.append((i, f"mail {ip_local} sent"))
    want[i] = ({"email": 1, "phone": 0, "ipv4": 0}, "mail [EMAIL] sent")
    i += 1
    phone_local = f"+{rng.randint(1, 9)}-{rng.randint(100, 999)}-{rng.randint(100, 999)}@x{seed}.org"
    docs.append((i, f"from {phone_local}"))
    want[i] = ({"email": 1, "phone": 0, "ipv4": 0}, "from [EMAIL]")
    i += 1

    # --- 3. boundary / adjacency plants ------------------------------
    em2 = gen_email(rng)
    docs.append((i, f"write {em2}."))
    want[i] = ({"email": 1, "phone": 0, "ipv4": 0}, "write [EMAIL].")
    i += 1
    ip2 = gen_ipv4(rng)
    docs.append((i, f"{em2},{ip2} ok"))
    want[i] = ({"email": 1, "phone": 0, "ipv4": 1}, "[EMAIL],[IP] ok")
    i += 1
    docs.append((i, "5-octet 1.2.3.4.5 run"))
    want[i] = ({"email": 0, "phone": 0, "ipv4": 1}, "5-octet [IP].5 run")
    i += 1
    docs.append((i, "call +1-234-567-89012"))
    want[i] = ({"email": 0, "phone": 1, "ipv4": 0}, "call [PHONE]2")
    i += 1

    # --- 4. near-misses ----------------------------------------------
    near = ("user@domain a@b.c @x.com 1-234-567 "
            "+1234-567-890 1.2.3 1.2.3.4567")
    docs.append((i, near))
    want[i] = ({"email": 0, "phone": 0, "ipv4": 0}, near)
    want_email_only[i] = near
    i += 1

    # --- 5. contracts -------------------------------------------------
    docs.append((i, ""))
    want[i] = ({"email": 0, "phone": 0, "ipv4": 0}, "")
    i += 1
    docs.append((i, None))
    want[i] = ({"email": 0, "phone": 0, "ipv4": 0}, None)
    i += 1

    df = spark.createDataFrame(docs, "doc_id long, text string")

    # --- batch API under two partitionings ----------------------------
    for parts in (3, 7):
        out = {
            r["doc_id"]: (
                {"email": r["n_email"], "phone": r["n_phone"],
                 "ipv4": r["n_ipv4"]},
                r["redacted"],
            )
            for r in redact_pii_with_counts(df.repartition(parts)).collect()
        }
        for d, (wc, wr) in want.items():
            gc, gr = out[d]
            if gc != wc:
                violations.append(f"counts/p{parts}/doc{d}: {gc} != {wc}")
            if gr != wr:
                violations.append(f"redacted/p{parts}/doc{d}: {gr!r} != {wr!r}")

    # --- single-Column twins ------------------------------------------
    rows = df.select(
        "doc_id",
        pii_counts("text").alias("c"),
        redact_pii("text").alias("r"),
        redact_pii("text", kinds=()).alias("ident"),
        redact_pii("text", kinds=("email",)).alias("em_only"),
    ).collect()
    for r in rows:
        d = r["doc_id"]
        wc, wr = want[d]
        gc = {"email": r["c"]["email"], "phone": r["c"]["phone"],
              "ipv4": r["c"]["ipv4"]}
        if gc != wc:
            violations.append(f"pii_counts/doc{d}: {gc} != {wc}")
        if r["r"] != wr:
            violations.append(f"redact_pii/doc{d}: {r['r']!r} != {wr!r}")
        orig = dict(docs)[d]
        if r["ident"] != orig:
            violations.append(f"kinds=()/doc{d}: {r['ident']!r} != {orig!r}")
        if d in want_email_only and r["em_only"] != want_email_only[d]:
            violations.append(
                f"kinds=email/doc{d}: {r['em_only']!r} != "
                f"{want_email_only[d]!r}")

    n_planted = sum(sum(c.values()) for c, _ in want.values())
    return {"seed": seed, "docs": len(docs), "planted_matches": n_planted,
            "violations": violations}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_pii_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-pii", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} docs={rec['docs']} "
              f"planted={rec['planted_matches']}", file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "planted_matches_total": sum(r["planted_matches"] for r in records),
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
