"""Scale-stress of the dedup chain on a SKEWED ~10x corpus.

The harness tables are uniform: every document ~50 tokens, near-dup
clusters tiny. The real-world corpus the chain targets is not (the
reference corpus runs 14k-58k tokens/doc, and web crawls carry viral
near-dup clusters thousands of copies deep). This script synthesizes that
shape from sf0.1 — all Spark-side, no driver loops — and runs
exact -> MinHash-LSH -> connected components -> span dedup end-to-end,
printing per-stage wall times plus the skew artifacts that prove no
single-task funnel:

* 10 "viral" docs spawn ``viral_reps`` near-dup mutants each (the banding
  hot-key hazard and a giant component);
* every other doc spawns 0-9 mutants (hash-derived, deterministic);
* a 2% slice of originals is inflated ~300x to ~15k tokens (the per-doc
  shingle-mass hazard) with per-repeat salt so inflation isn't exact-dup;
* mutants replace ~1/17 of tokens (Jaccard ~0.7 at 3-shingles — above the
  0.5 LSH threshold, below exact-dup).

Artifacts printed per run: corpus size/token mass, stage wall-times, the
top LSH band-bucket sizes (the skew evidence — the quadratic hazard is
bucket_size^2), the biggest component (must be ~viral_reps+1, i.e. the
chain actually closed the viral cluster), and span-dedup survivors.

    python examples/stress_dedup_chain.py [sf_dir] [viral_reps]

Results recorded in SCALE.md ("Dedup-chain skew stress").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    connected_components,
    exact_dedup,
    span_dedup,
    unpersist_inputs,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    lsh_band_table,
    minhash_dedup_pairs,
    minhash_signatures,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
)


def build_skewed_corpus(spark, sf_dir: str, viral_reps: int = 2000):
    """~10x the base corpus with viral clusters, a hash-derived mutant
    tail, and a long-document slice — one lazy plan, zero driver loops."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # 2% long-doc slice: repeat the text ~300x, salting each repeat with a
    # position token so the copies aren't byte-identical (span dedup's job)
    long_slice = F.col("doc_id") % 50 == 0
    inflated = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(300)),
            lambda i: F.concat_ws(" ", F.concat(F.lit("p"), i.cast("string")), F.col("text")),
        ),
        " ",
    )
    sized = base.withColumn("text", F.when(long_slice, inflated).otherwise(F.col("text")))

    # fan-out: 10 viral docs -> viral_reps mutants; tail docs -> 0-9 mutants
    viral = F.col("doc_id").isin([7, 123, 456, 789, 1111, 2222, 3333, 4040, 4444, 4999])
    reps = F.when(viral, F.lit(viral_reps)).otherwise(
        F.pmod(F.xxhash64("doc_id"), F.lit(10))
    )
    fanned = sized.withColumn(
        "replica", F.explode(F.sequence(F.lit(0), reps))
    )

    # mutation: replica r replaces tokens at positions == r mod 17 with a
    # replica-unique token — ~6% token churn, Jaccard ~0.7 at 3-shingles.
    # replica 0 keeps the original text byte-for-byte.
    toks = F.split(F.col("text"), " ")
    mutated = F.array_join(
        F.zip_with(
            toks,
            F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda t, i: F.when(
                (F.col("replica") > 0)
                & (F.pmod(i, F.lit(17)) == F.pmod(F.col("replica"), F.lit(17))),
                F.concat(F.lit("mut"), F.col("replica").cast("string")),
            ).otherwise(t),
        ),
        " ",
    )
    out = fanned.select(
        (F.col("doc_id") * 10000 + F.col("replica")).alias("doc_id"),
        mutated.alias("text"),
    )
    # the explode fan-out keeps the PARENT's partitioning: a 500-row base
    # parquet reads as 1-2 splits, so without this the whole 10x corpus —
    # including every inflated long doc — lands in 1-2 tasks and each
    # downstream scan stage runs single-threaded (measured: the round-4
    # chunker fix was invisible until this repartition exposed it). A real
    # 100 TB read has thousands of splits; a fan-out stage on a small dim
    # table needs the explicit spread.
    return out.repartition(64, "doc_id")


def semdedup_skew_stress(spark, sf_dir: str, n_total: int = 30_000,
                         skew: float = 0.9) -> None:
    """SemDeDup megacell stress (VERDICT r8 item 6): semantic_dedup's
    docstring names the failure mode (one runaway cell -> strip x n_cell
    blowup) and the remedy (raise n_lists / refit) — this measures both.

    Corpus: ``n_total`` vectors fanned out from the sf embeddings table,
    ``skew`` of them a tight blob around one fixed centroid (cosine ~1
    within the blob — worst case: megacell AND near-total domination), the
    rest the original spread. Run 1 uses the 8 fixed centroids the blob was
    aimed at — the megacell materializes and the strip peak is measured at
    its worst. Run 2 is the documented remediation: k-means centroids
    refit on the skewed data (n_lists=64) subdivide the blob, and the
    histogram + strip peak + wall time are re-measured. All generation is
    one lazy plan — no driver loops, no collected vectors."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
        cell_histogram,
        ivf_build_index,
        ivf_fixed_centroids,
        semantic_dedup,
    )

    dim, strip = 64, 1024
    fixed = ivf_fixed_centroids(dim, n_lists=8)
    mu = fixed[3]  # the blob magnet: every blob row lands in this cell
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reps = max(1, n_total // emb.count())
    fanned = emb.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
    ).select(
        (F.col("vec_id") * reps + F.col("_r")).alias("vec_id"), "embedding"
    )
    rid = F.col("vec_id")
    is_blob = F.pmod(F.xxhash64(rid), F.lit(100)) < int(skew * 100)
    mu_lit = F.array(*[F.lit(float(x)) for x in mu])
    # per-(row, dim) deterministic jitter in [-0.01, 0.01]: keeps blob rows
    # distinct (not exact dups) but cosine-~1 to each other
    blob_vec = F.zip_with(
        mu_lit,
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: (F.pmod(F.xxhash64(rid, i), F.lit(1000))
                               .cast("double") - 500.0) / 50000.0),
        lambda m, j: (m + j).cast("float"),
    )
    corpus = fanned.select(
        "vec_id",
        F.when(is_blob, blob_vec).otherwise(F.col("embedding")).alias("embedding"),
    ).repartition(64, "vec_id").persist()
    n = corpus.count()
    print(f"semdedup skew corpus: {n} vectors, {skew:.0%} blob, dim {dim}")

    for label, centroids in (
        ("megacell (8 fixed centroids, blob-aimed)", fixed),
        ("remediated (64 k-means centroids refit on the skewed data)",
         ivf_build_index(corpus, n_lists=64)[1]),
    ):
        t0 = time.time()
        out = semantic_dedup(corpus, centroids, threshold=0.95)
        survivors = out.count()
        wall = time.time() - t0
        hist = cell_histogram(_assign_hist(corpus, centroids)).limit(5).collect()
        top = hist[0]["n"] if hist else 0
        peak = strip * top * 8  # the dominated-mask sims strip, float64
        print(
            f"  {label}: top cells {[r['n'] for r in hist]}, "
            f"strip peak {peak / 1e6:.0f} MB, survivors {survivors}/{n}, "
            f"wall {wall:.1f}s"
        )
        unpersist_inputs(out)
    corpus.unpersist()


def _assign_hist(corpus, centroids):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.similarity import (
        ivf_assign,
    )

    return ivf_assign(corpus, centroids)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--semdedup":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        spark = get_spark(app_name="vlds-stress-semdedup", shuffle_partitions=32)
        semdedup_skew_stress(spark, sf_dir)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    viral_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="vlds-stress-dedup", shuffle_partitions=32)

    t0 = time.time()
    corpus = build_skewed_corpus(spark, sf_dir, viral_reps).persist()
    n_docs = corpus.count()
    mass = corpus.select(F.sum(F.size(F.split("text", " "))).alias("m")).first()["m"]
    t_build = time.time() - t0
    print(f"corpus: {n_docs} docs, {mass/1e6:.1f}M tokens  [{t_build:.1f}s]")

    t0 = time.time()
    exact = exact_dedup(corpus).persist()
    n_exact = exact.count()
    t_exact = time.time() - t0
    print(f"exact dedup: {n_exact} survivors  [{t_exact:.1f}s]")

    # skew evidence: the biggest LSH band buckets (quadratic hazard = n^2)
    t0 = time.time()
    sigs = minhash_signatures(exact)
    top = (
        lsh_band_table(sigs)
        .groupBy("band_idx", "band_hash")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    )
    print(
        "top band buckets:",
        [r["count"] for r in top],
        f" [{time.time() - t0:.1f}s]",
    )

    t0 = time.time()
    pairs = minhash_dedup_pairs(exact, threshold=0.5)
    n_pairs = pairs.persist().count()
    t_pairs = time.time() - t0
    print(f"minhash pairs (est_jaccard>=0.5): {n_pairs}  [{t_pairs:.1f}s]")

    t0 = time.time()
    comp = connected_components(pairs, nodes=exact, id_col="doc_id")
    biggest = (
        comp.groupBy("component").count().orderBy(F.desc("count")).limit(3).collect()
    )
    n_comp = comp.select("component").distinct().count()
    t_comp = time.time() - t0
    print(
        f"components: {n_comp} clusters, top sizes "
        f"{[r['count'] for r in biggest]}  [{t_comp:.1f}s]"
    )

    t0 = time.time()
    spanned = span_dedup(exact, span_tokens=50)
    n_span = spanned.filter(F.col("text") != "").count()
    t_span = time.time() - t0
    print(f"span dedup: {n_span} docs keep text  [{t_span:.1f}s]")

    unpersist_inputs(pairs)
    total = t_build + t_exact + t_pairs + t_comp + t_span
    print(f"chain total: {total:.1f}s")


if __name__ == "__main__":
    main()
