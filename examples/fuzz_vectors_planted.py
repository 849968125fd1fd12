"""Vector-preprocessing family against PLANTED ground truth (round 13).

`l2_norm` / `l2_normalize` / `int8_scale` / `int8_quantize` /
`int8_dequantize` / `quantization_error` (functions/vectors.py) feed
`embedding_int8_roundtrip` and the ANN/semantic-dedup unit-norm paths;
their DuckDB oracles replay the same floor(x*scale+0.5) arithmetic
bit-for-bit (shared lineage — the module docstring says so). This
harness constructs vectors whose quantization behavior follows from the
construction alone:

1. DYADIC GRID — elements are multiples of 2^-m with max|x| = 127/2^m,
   so the scale is EXACTLY 2^m (a representable power of two), x*scale
   is an exact integer, and the roundtrip is the identity: codes equal
   x*2^m by construction, dequantized equals the input bit-for-bit,
   quantization_error is exactly 0.0.
2. ROUNDING-CONVENTION EDGES — elements planted exactly halfway between
   grid points: with scale 2^m, x = (k+0.5)/2^m must code to k+1 and
   x = -(k+0.5)/2^m must code to -k (floor(x*s+0.5) is
   round-half-toward-+infinity, NOT half-even); a silent switch to
   round() half-even semantics fails these plants by construction.
3. OFF-GRID ERROR — a planted off-grid element whose reconstruction
   error has a closed form |x - code/scale|, and the documented bound
   error <= 0.5/scale checked on every vector.
4. PYTHAGOREAN NORMS — quadruples/triples with exact integer L2 norms
   ((3,4)->5, (5,12)->13, (8,15)->17, (2,3,6)->7, (1,2,2)->3):
   l2_norm returns the exact integer, l2_normalize divides by it
   (IEEE-exact expectation computed without running any engine code),
   and a normalized vector's norm is 1 within 1e-12.
5. CONTRACTS — zero vector: scale 1.0, codes all 0, dequant all 0.0,
   normalize keeps it zero (no NaN); singleton and 127-max vectors;
   codes stay within [-127, 127] everywhere (tinyint-safe).

    python examples/fuzz_vectors_planted.py [--seeds 20]
                                            [--out fuzz_vectors_last.json]

tests/test_fuzz_vectors_planted.py runs a 2-seed slice per session.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PYTHAGOREAN = [
    ((3.0, 4.0), 5.0),
    ((5.0, 12.0), 13.0),
    ((8.0, 15.0), 17.0),
    ((2.0, 3.0, 6.0), 7.0),
    ((1.0, 2.0, 2.0), 3.0),
    ((1.0, 4.0, 8.0), 9.0),
    ((2.0, 6.0, 9.0), 11.0),
]


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.vectors import (
        int8_dequantize,
        int8_quantize,
        int8_scale,
        l2_norm,
        l2_normalize,
        quantization_error,
    )

    rng = random.Random(314000 + seed)
    violations: list[str] = []

    rows: list[tuple[int, list[float]]] = []
    want_codes: dict[int, list[int]] = {}
    want_deq: dict[int, list[float]] = {}     # exact bit-for-bit expectation
    want_scale: dict[int, float] = {}
    want_err: dict[int, float] = {}           # exact expected max error
    i = 0

    # --- 1+2. dyadic grid + half-edges per seed -----------------------
    for m in rng.sample([0, 1, 2, 3, 4], 3):
        s = float(2 ** m)
        step = 1.0 / s
        # grid vector: random integer codes in [-126, 126], one pinned at
        # +127 so max|x| = 127/2^m and the scale is exactly 2^m
        ks = [rng.randint(-126, 126) for _ in range(rng.randint(3, 8))]
        ks.append(127)
        rng.shuffle(ks)
        vec = [k * step for k in ks]
        rows.append((i, vec))
        want_scale[i] = s
        want_codes[i] = list(ks)
        want_deq[i] = [k / s for k in ks]     # == vec exactly (dyadic)
        want_err[i] = 0.0
        i += 1

        # half-edge vector: max pinned at 127/s, plus +(k+0.5)/s -> k+1
        # and -(k+0.5)/s -> -k (floor(x*s+0.5) rounds halves toward +inf)
        kp = rng.randint(0, 125)
        kn = rng.randint(0, 125)
        vec = [127.0 * step, (kp + 0.5) * step, -(kn + 0.5) * step]
        rows.append((i, vec))
        want_scale[i] = s
        want_codes[i] = [127, kp + 1, -kn]
        want_deq[i] = [127.0 / s, (kp + 1) / s, -kn / s]
        want_err[i] = 0.5 / s                 # both half-edges miss by 1/2s
        i += 1

    # --- 3. off-grid closed-form error --------------------------------
    # scale exactly 4 (max = 31.75), one element at k/4 + 1/16: code k
    # (frac 0.25 < 0.5 from the grid point), error exactly 1/16
    k = rng.randint(-100, 100)
    vec = [31.75, k / 4.0 + 0.0625]
    rows.append((i, vec))
    want_scale[i] = 4.0
    want_codes[i] = [127, k]
    want_deq[i] = [31.75, k / 4.0]
    want_err[i] = 0.0625
    i += 1

    # --- 5. contracts --------------------------------------------------
    zero = [0.0] * rng.randint(2, 6)
    rows.append((i, zero))
    want_scale[i] = 1.0
    want_codes[i] = [0] * len(zero)
    want_deq[i] = [0.0] * len(zero)
    want_err[i] = 0.0
    i += 1
    rows.append((i, [127.0]))                 # singleton at the max code
    want_scale[i] = 1.0
    want_codes[i] = [127]
    want_deq[i] = [127.0]
    want_err[i] = 0.0
    i += 1

    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            int8_scale("v").alias("s"),
            int8_quantize("v", int8_scale("v")).alias("codes"),
            int8_dequantize(
                int8_quantize("v", int8_scale("v")), int8_scale("v")
            ).alias("deq"),
            quantization_error("v", int8_scale("v")).alias("err"),
        ).collect()
    }
    for d, _vec in rows:
        r = got[d]
        if abs(r["s"] - want_scale[d]) != 0.0:
            violations.append(f"scale/vec{d}: {r['s']!r} != {want_scale[d]!r}")
        if list(r["codes"]) != want_codes[d]:
            violations.append(
                f"codes/vec{d}: {list(r['codes'])} != {want_codes[d]}")
        if list(r["deq"]) != want_deq[d]:
            violations.append(
                f"dequant/vec{d}: {list(r['deq'])} != {want_deq[d]}")
        if r["err"] != want_err[d]:
            violations.append(f"error/vec{d}: {r['err']!r} != {want_err[d]!r}")
        if any(not -127 <= c <= 127 for c in r["codes"]):
            violations.append(f"range/vec{d}: codes escape [-127,127]")

    # --- 4. Pythagorean norms ------------------------------------------
    prows = [(j, list(v)) for j, (v, _) in enumerate(PYTHAGOREAN)]
    pdf = spark.createDataFrame(prows, "id long, v array<double>")
    gotp = {
        r["id"]: r
        for r in pdf.select(
            "id",
            l2_norm("v").alias("n"),
            l2_normalize("v").alias("u"),
            l2_norm(l2_normalize("v")).alias("un"),
        ).collect()
    }
    for j, (v, n) in enumerate(PYTHAGOREAN):
        r = gotp[j]
        if r["n"] != n:                       # integer norm must be exact
            violations.append(f"norm/{v}: {r['n']!r} != {n!r}")
        want_u = [x / n for x in v]           # IEEE division, no engine code
        if list(r["u"]) != want_u:
            violations.append(f"unit/{v}: {list(r['u'])} != {want_u}")
        if abs(r["un"] - 1.0) > 1e-12:
            violations.append(f"unitnorm/{v}: {r['un']!r} != 1.0")
    # zero-vector normalize: stays zero, no NaN
    zdf = spark.createDataFrame([(0, [0.0, 0.0, 0.0])], "id long, v array<double>")
    zu = zdf.select(l2_normalize("v").alias("u")).first()["u"]
    if list(zu) != [0.0, 0.0, 0.0]:
        violations.append(f"zero-normalize: {list(zu)}")

    return {"seed": seed, "vectors": len(rows) + len(prows) + 1,
            "violations": violations}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_vectors_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-vectors", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} vectors={rec['vectors']}",
              file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "vectors_total": sum(r["vectors"] for r in records),
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
