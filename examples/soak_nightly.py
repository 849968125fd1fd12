"""Nightly-increment soak at ~10x with skew (VERDICT r5 item 5).

The nightly composition's O(batch) cost model (SCALE.md) is contract-
tested at harness scale; this script turns its claims into measured rows.
It reuses the stress corpus generator (examples/stress_dedup_chain.py:
viral near-dup clusters thousands deep, a hash-derived mutant tail, a 2%
~15k-token long-doc slice) and runs THREE consecutive "nights":

  * bootstrap — 60% of the skewed corpus seeds snapshot v0 and its two
    sidecars (the one-time O(N) cost);
  * night 1 — a ~20% wave lands and is curated against the stored
    sidecars (viral clusters straddle the corpus/batch split, so the
    batch-vs-stored band join sees real hot keys);
  * night 2 — the remaining ~20% wave PLUS a re-crawl wave (5% of the
    bootstrap docs re-land byte-identical under NEW ids — the shape the
    fingerprint gate exists for).

The pass criterion is the cost model itself: night-2 wall ~= night-1 wall
(same batch size, one night older corpus — no O(corpus) creep), and the
re-crawl wave publishes ZERO docs. Results go in SCALE.md ("Nightly soak").

    python examples/soak_nightly.py [sf_dir] [viral_reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling examples

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.sinks import (
    IdempotentParquetBatchWriter,
)


def land_batch(spark, df, zone: str) -> None:
    """Land one night's drop in the committed-batch layout the nightly run
    reads (batch_id=0 + _COMMITTED), with the corrupt-ledger column the
    ingest stream would have carried (all-clean here — corrupt-line
    handling is exercised by the ingest walkthrough, not the soak)."""
    IdempotentParquetBatchWriter(zone)(
        df.withColumn("_corrupt_record", F.lit(None).cast("string")), 0
    )


def main() -> None:
    import tempfile

    from nightly_increment import bootstrap_corpus, nightly_increment
    from stress_dedup_chain import build_skewed_corpus

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    viral_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="vlds-soak-nightly")
    work = tempfile.mkdtemp(prefix="vlds_soak_")
    corpus_dir = os.path.join(work, "corpus")

    # materialize the skewed corpus once so nightly walls measure the
    # composition, not the generator's lazy recomputation
    skewed_path = os.path.join(work, "skewed.parquet")
    build_skewed_corpus(spark, sf_dir, viral_reps).write.parquet(skewed_path)
    docs = spark.read.parquet(skewed_path)
    n_docs = docs.count()

    # deterministic waves; viral clusters straddle every wave
    wave = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(100))
    boot = docs.filter(wave < 60)
    wave1 = docs.filter((wave >= 60) & (wave < 80))
    wave2 = docs.filter(wave >= 80)
    # re-crawl: 5% of the BOOTSTRAP docs re-land byte-identical, new ids
    recrawl = boot.filter(wave < 5).withColumn(
        "doc_id", F.col("doc_id") + F.lit(2_000_000_000)
    )

    t0 = time.perf_counter()
    v = bootstrap_corpus(spark, boot, corpus_dir)
    t_boot = time.perf_counter() - t0
    n_boot = spark.read.parquet(f"{corpus_dir}/snapshot/v0").count()
    print(f"bootstrap: {n_boot} docs of {n_docs}  wall={t_boot:.1f}s")

    walls, nights = [], []
    for label, batch in (("night1", wave1), ("night2", wave2.unionByName(recrawl))):
        zone = os.path.join(work, f"zone_{label}")
        land_batch(spark, batch, zone)
        t0 = time.perf_counter()
        c = nightly_increment(spark, zone, corpus_dir, v)
        wall = time.perf_counter() - t0
        v = c["version"]
        walls.append(wall)
        nights.append((label, c, wall))
        print(f"{label}: wall={wall:.1f}s  {c}")

    (n1, c1, w1), (n2, c2, w2) = nights
    ratio = w2 / w1
    print(f"night2/night1 wall ratio: {ratio:.2f} "
          f"(batches {c1['landed']} vs {c2['landed']} docs)")
    # the fingerprint gate must eat the whole re-crawl wave: fresh docs
    # after skip+exact exclude every byte-identical re-land
    n_recrawl = recrawl.count()
    print(f"re-crawl wave: {n_recrawl} byte-identical re-lands; "
          f"night2 fresh={c2['fresh_after_skip_and_exact']} "
          f"(wave2 alone = {wave2.count()})")
    assert c2["fresh_after_skip_and_exact"] <= c2["landed"] - n_recrawl, (
        "fingerprint gate leaked re-crawled text into the fresh set"
    )
    if ratio > 2.0:
        print(f"WARNING: night-2 cost {ratio:.2f}x night-1 — O(corpus) creep?",
              file=sys.stderr)
        raise SystemExit(1)
    print("# soak ok: no O(corpus) creep, re-crawl wave fully gated")


if __name__ == "__main__":
    main()
