"""Embedding-dimension scaling stress (round 13).

The r13 review caught an O(d^2)-per-vector normalization in
`embedding_contamination` that every test had passed — because the whole
suite (and the harness testdata) runs embeddings at dim 64, where the
quadratic term hides inside session noise. Production embedding columns
are 768-4096 wide: DIMENSION is a scale axis, same as row count, and a
per-row cost super-linear in d is a 100 TB scale-killer that sf-scaling
sweeps (which scale ROWS) can never see.

This harness synthesizes a fixed-row corpus at dims 64 -> 256 -> 1024
(16x span) and times the embedding-family hot paths end-to-end:

* ``l2_normalize`` + consume (the rewritten array_repeat form)
* ``int8_quantize`` -> ``int8_dequantize`` round trip + error max
* ``srp_signature_expr`` bucket build (16 hyperplanes, the LSH front door)
* ``embedding_contamination`` (broadcast test side x train corpus —
  the operator the review fixed; its pre-fix form fails this guard)
* ``cosine_topk`` brute force (documented O(n*q*d) baseline)

For each op it fits the effective exponent e = log(t_hi/t_lo) /
log(d_hi/d_lo) over the widest dim pair and FAILS (exit 1) if any op
exceeds ``--max-exponent`` (default 1.6: per-row work for every op above
is Theta(d), so even with constant overheads amortized away a healthy
run sits well under 1.3; the pre-fix contamination form measured e ~= 2
— 19.2s vs 0.24s at dim 512 on the normalize microbenchmark, SCALE.md
"Expression-evaluation hazards"). Row count stays fixed so the exponent
isolates the dimension axis.

    python examples/stress_embedding_dims.py [--rows 6000] [--reps 2]
        [--dims 64 256 1024] [--out stress_dims_last.json]

tests/test_stress_embedding_dims.py runs a 2-dim smoke slice per
session (correctness of the harness, not timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, rows: int, dim: int):
    from pyspark.sql import functions as F

    df = spark.range(rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.rand(seed=7) * 2.0 - 1.0 + i.cast("double") * 0.0,
        ).alias("embedding"),
    ).persist()
    df.count()
    return df


def run_ops(spark, df, dim: int, n_queries: int = 24) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.vectors import (
        int8_dequantize,
        int8_quantize,
        int8_scale,
        l2_normalize,
        quantization_error,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.contamination import (
        embedding_contamination,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
        cosine_topk,
        srp_signature_expr,
    )

    test_side = df.limit(n_queries)
    queries = test_side.select(F.col("vec_id").alias("query_id"),
                               F.col("embedding").alias("qv"))

    def t_normalize():
        df.select(F.sum(F.element_at(l2_normalize("embedding"), 1))).collect()

    def t_int8():
        s = int8_scale("embedding")
        df.select(
            F.max(quantization_error("embedding", s)).alias("e"),
            F.sum(F.element_at(int8_dequantize(
                int8_quantize("embedding", s), s), 1)).alias("x"),
        ).collect()

    def t_srp():
        df.select(F.countDistinct(
            srp_signature_expr("embedding", dim, n_planes=16))).collect()

    def t_contamination():
        embedding_contamination(test_side, df, threshold=0.98).count()

    def t_cosine_topk():
        cosine_topk(queries, df, k=3).count()

    return {
        "l2_normalize": t_normalize,
        "int8_roundtrip": t_int8,
        "srp_signature": t_srp,
        "embedding_contamination": t_contamination,
        "cosine_topk": t_cosine_topk,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dims", type=int, nargs="*", default=[64, 256, 1024])
    ap.add_argument("--max-exponent", type=float, default=1.6)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "stress_dims_last.json"))
    args = ap.parse_args()

    import math

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-stress-dims", shuffle_partitions=16)
    dims = sorted(args.dims)
    times: dict[str, dict[int, float]] = {}
    for dim in dims:
        df = build_corpus(spark, args.rows, dim)
        ops = run_ops(spark, df, dim)
        for name, fn in ops.items():
            fn()  # warm (plan compile, codegen)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            times.setdefault(name, {})[dim] = round(best, 3)
            print(f"# dim={dim} {name}: {best:.3f}s", file=sys.stderr)
        df.unpersist()

    lo, hi = dims[0], dims[-1]
    span = math.log(hi / lo)
    exponents = {
        name: round(math.log(max(by[hi], 1e-6) / max(by[lo], 1e-6)) / span, 3)
        for name, by in times.items()
    }
    bad = {n: e for n, e in exponents.items() if e > args.max_exponent}
    rec = {
        "rows": args.rows,
        "dims": dims,
        "reps": args.reps,
        "max_exponent_allowed": args.max_exponent,
        "times_sec": {n: {str(d): t for d, t in by.items()}
                      for n, by in times.items()},
        "exponents": exponents,
        "superlinear": bad,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps({"exponents": exponents, "superlinear": bad}))
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
