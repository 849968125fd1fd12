"""Stage decomposition for the remaining >1.5s bench queries (guide §1).

Times each named SUBPLAN of a query with the noop sink, interleaved across
rounds in one session, so the per-stage costs can be attributed on the same
box-noise profile. Pure measurement — no engine code is touched.

    python examples/probe_stage_decomp.py minhash quality ann [--rounds 3]

Families:
  minhash  — signature agg vs banding vs est-join for the xxhash64 twins
  quality  — doc_quality_report's four signal subframes vs the composed join
  ann      — the three ANN subplans vs the composed ann_recall_at3
  pipelines— iterative/critique flagships (whole only; driver loops
             decompose via their own probes)
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.tables import (
    load_table,
)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_arms(family: str, spark, sf_dir: str):
    """Return {label: thunk} — each thunk builds AND materializes the
    subplan (so per-rep persist/unpersist stays inside the timing)."""
    if family == "minhash":
        from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
            lsh_band_table,
            minhash_lsh_star_candidates,
            minhash_signatures,
        )

        def docs():
            return load_table(spark, sf_dir, "documents", spread=True).select(
                "doc_id", "text"
            )

        def sigs_noop():
            _noop(minhash_signatures(docs(), n_hashes=64, include_missing=False))

        def bands_noop():
            s = minhash_signatures(docs(), n_hashes=64, include_missing=False).persist()
            try:
                _noop(lsh_band_table(s, "doc_id", "minhash", 16, 64))
            finally:
                s.unpersist()

        def star_cands_noop():
            s = minhash_signatures(docs(), n_hashes=64, include_missing=False).persist()
            try:
                _noop(minhash_lsh_star_candidates(s, "doc_id", "minhash", 16, 64))
            finally:
                s.unpersist()

        def full_star():
            _noop(QUERIES["minhash_star_fast"](spark, sf_dir))

        def full_incremental():
            _noop(QUERIES["minhash_incremental_fast"](spark, sf_dir))

        return {
            "sigs": sigs_noop,
            "sigs+bands": bands_noop,
            "sigs+star_cands": star_cands_noop,
            "full_star": full_star,
            "full_incremental": full_incremental,
        }

    if family == "quality":
        from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.text import (
            ws_token_count,
        )
        from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
            char_count,
            char_entropy_batch,
            doc_fingerprint,
            language_id,
            quality_score,
            repetition_stats_batch,
        )
        from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.vocab import (
            unigram_logprob,
        )

        def docs():
            return load_table(spark, sf_dir, "documents", spread=True)

        def base_noop():
            c = F.col("text")
            _noop(
                docs().select(
                    "doc_id",
                    F.coalesce(char_count(c), F.lit(0)).alias("n_chars"),
                    F.coalesce(ws_token_count(c), F.lit(0)).alias("n_tokens"),
                    F.round(quality_score(c), 6).alias("quality"),
                    F.coalesce(language_id(c), F.lit("und")).alias("lang_guess"),
                    doc_fingerprint(c).alias("fingerprint"),
                )
            )

        def ent_noop():
            _noop(char_entropy_batch(docs()))

        def rep_noop():
            _noop(repetition_stats_batch(docs()))

        def lp_noop():
            _noop(unigram_logprob(docs()))

        def full():
            _noop(QUERIES["doc_quality_report"](spark, sf_dir))

        return {
            "base": base_noop,
            "entropy": ent_noop,
            "repetition": rep_noop,
            "logprob": lp_noop,
            "full": full,
        }

    if family == "ann":
        return {
            "knn": lambda: _noop(QUERIES["embedding_knn_top3"](spark, sf_dir)),
            "lsh": lambda: _noop(QUERIES["embedding_ann_lsh_top3"](spark, sf_dir)),
            "ivf": lambda: _noop(QUERIES["embedding_ivf_fixed_top3"](spark, sf_dir)),
            "full_recall": lambda: _noop(QUERIES["ann_recall_at3"](spark, sf_dir)),
        }

    if family == "pipelines":
        return {
            "iterative": lambda: _noop(QUERIES["pipeline_iterative_mock"](spark, sf_dir)),
            "critique": lambda: _noop(QUERIES["pipeline_critique_mock"](spark, sf_dir)),
            "mapreduce": lambda: _noop(QUERIES["pipeline_mapreduce_mock"](spark, sf_dir)),
        }

    raise SystemExit(f"unknown family {family!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="+")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vlds-stage-decomp")

    arms: dict[str, dict] = {}
    for fam in args.families:
        for label, thunk in build_arms(fam, spark, sf_dir).items():
            arms[f"{fam}/{label}"] = thunk

    for label, thunk in arms.items():  # warm every arm once (plan compile)
        thunk()

    reps: dict = {label: [] for label in arms}
    for _ in range(args.rounds):
        for label, thunk in arms.items():
            spark.catalog.clearCache()
            gc.collect()
            release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext),
                         blocking=True)
            t0 = time.perf_counter()
            thunk()
            reps[label].append(round(time.perf_counter() - t0, 3))

    out = {}
    for label, arr in reps.items():
        out[label] = {"reps": arr, "min": min(arr)}
        print(f"# {label}: min={min(arr)}s reps={arr}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
