"""End-to-end example: streaming JSONL ingestion into an exactly-once
landing zone, then incremental batch curation — the "ingestion before batch
curation" story the exactly-once sink exists for.

    python examples/ingest_stream.py [sf_dir]

Stages:

  1. JSONL files land in a watch directory (here: derived from the harness
     documents table, with corrupt lines injected to exercise the ledger).
  2. ``read_jsonl_corpus_stream`` parses them with the DECLARED document
     schema + corrupt-line ledger (same semantics as the batch reader —
     the two paths cannot diverge on what counts as a document).
  3. ``write_stream_idempotent_parquet`` appends each micro-batch to the
     landing zone under ``batch_id=N/`` with a ``_COMMITTED`` marker —
     at-least-once foreachBatch replays become exactly-once output.
  4. Batch curation reads ONLY committed batches (a half-written batch
     from a crashed writer stays invisible), quarantines the corrupt-line
     ledger, anti-joins away docs already in the curated corpus
     (``skip_existing`` — the reference's skip-if-exists incremental
     recompute, F3), and exact-dedups what remains before it is appended.

At 100 TB the landing zone is an object-store prefix, the watch directory
is the upstream crawler's output, and stage 4 runs on a schedule — nothing
in the plan changes: the committed-batch listing is O(batches), the
skip-existing anti-join broadcasts only the curated corpus's key set, and
exact dedup shuffles on an 8-byte fingerprint.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    exact_dedup,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.pairing import (
    skip_existing_bloom,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
    read_jsonl_corpus_stream,
    split_corrupt,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming import (
    read_committed_batches,
    write_stream_idempotent_parquet,
)


def seed_landing_dir(spark, sf_dir: str, landing_dir: str, n_files: int = 3) -> None:
    """Simulate the upstream crawler: split the harness documents into
    ``n_files`` JSONL drops and inject one corrupt line per file."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    jsonl = docs.select(
        F.to_json(F.struct("doc_id", "text", "lang", "source")).alias("value"),
        F.pmod(F.col("doc_id"), F.lit(n_files)).alias("_f"),
    )
    os.makedirs(landing_dir, exist_ok=True)
    for i in range(n_files):
        lines = [r["value"] for r in jsonl.filter(F.col("_f") == i).collect()]
        lines.append('{"doc_id": broken json %d' % i)  # the ledger's food
        with open(os.path.join(landing_dir, f"drop-{i}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")


def ingest(spark, landing_dir: str, sink_dir: str, ckpt_dir: str,
           max_files_per_trigger: int = 1):
    """Stage 2+3: drain the landing directory into the exactly-once sink,
    one file per micro-batch. Restart-safe: the checkpoint remembers
    processed files, the ``_COMMITTED`` markers make replays no-ops."""
    stream = read_jsonl_corpus_stream(
        spark, landing_dir, max_files_per_trigger=max_files_per_trigger
    )
    q = write_stream_idempotent_parquet(stream, sink_dir, ckpt_dir)
    q.awaitTermination(300)


def curate_increment(spark, sink_dir: str, existing_docs):
    """Stage 4: (new_docs, corrupt_ledger) from the committed landing zone.

    NOTE: this is the minimal ID-keyed skip — a re-crawled page landing
    under a NEW doc_id passes it. The full gate chain (stored exact-text
    fingerprints + incremental near-dup against stored signatures +
    snapshot diff) is the ``examples/nightly_increment.py`` walkthrough.

    ``new_docs`` is exact-deduped and excludes anything whose ``doc_id``
    the curated corpus already holds; ``corrupt_ledger`` is the raw text of
    every malformed line for the quarantine sink. The skip-if-exists check
    runs through the Bloom pre-filter (``skip_existing_bloom``, exact
    mode): identical result to a plain anti-join, but the curated corpus
    broadcasts as a bit table instead of a row set — the shape that still
    works when the corpus holds 10^10 keys."""
    landed = read_committed_batches(spark, sink_dir).drop("batch_id")
    clean, corrupt = split_corrupt(landed)
    fresh = skip_existing_bloom(clean, existing_docs.select("doc_id"), key="doc_id")
    return exact_dedup(fresh), corrupt


def near_dedup_increment(new_docs, existing_docs, threshold: float = 0.5):
    """Near-dup pairs of the increment against the curated corpus PLUS
    within the increment itself, without re-self-joining the corpus
    (``minhash_incremental_pairs``): in production the corpus signatures
    are computed once and stored next to the corpus — here they are built
    inline. Returns (id1, id2, est_jaccard) with id1 < id2 BY ID VALUE —
    batch and corpus ids interleave, so to keep the corpus's copy drop
    whichever side of each pair is a batch id (semi-join against the
    batch's id set), or feed the pairs to ``dedup_keep_best``."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        minhash_incremental_pairs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        minhash_signatures,
    )

    new_sigs = minhash_signatures(new_docs.select("doc_id", "text"))
    corpus_sigs = minhash_signatures(existing_docs.select("doc_id", "text"))
    return minhash_incremental_pairs(new_sigs, corpus_sigs, threshold=threshold)


def main() -> None:
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="vlds-example-ingest")
    work = tempfile.mkdtemp(prefix="vlds_ingest_")
    landing, sink, ckpt = (os.path.join(work, d) for d in ("landing", "zone", "ckpt"))

    seed_landing_dir(spark, sf_dir, landing, n_files=3)
    ingest(spark, landing, sink, ckpt)

    # pretend half the corpus is already curated: the increment must skip it
    existing = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    new_docs, corrupt = curate_increment(spark, sink, existing)
    n_new, n_bad = new_docs.count(), corrupt.count()
    pairs = near_dedup_increment(new_docs, existing)
    n_near = pairs.count()
    print(f"landing zone: {sink}")
    print(f"new curated docs (skip-if-exists + exact dedup): {n_new}")
    print(f"near-dup pairs vs curated corpus (incremental MinHash): {n_near}")
    print(f"quarantined corrupt lines: {n_bad}")


if __name__ == "__main__":
    main()
