"""Nightly incremental-curation walkthrough: one composed run of the
pieces a curation team schedules against a growing corpus.

State on disk (the "curated corpus" between runs):

    corpus_dir/
      snapshot/v{N}/     curated documents (doc_id, text, ...)
      signatures/v{N}/   stored MinHash signatures (doc_id, minhash)
      fingerprints/v{N}/ stored exact-text fingerprints (doc_id, fp)
      diff/v{N}/         (key, status) audit vs v{N-1}
      pairs/v{N}/        near-dup pair audit for night N's batch
      manifest/v{N}_COMMITTED  written LAST — an unmarked version is a
                         crashed publish and stays invisible; recovery is
                         re-running the night (all writes are overwrite)

Each nightly run composes four operators that all exist standalone:

  1. ``read_committed_batches`` — the exactly-once landing zone written by
     the streaming ingester (examples/ingest_stream.py stages 1-3).
  2. ``skip_existing_bloom`` — drop docs the corpus already holds BY ID;
     the corpus's key set broadcasts as a bit table, not a row set (the
     shape that survives 10^10 keys), and exact mode keeps the result
     equal to a plain anti-join. A fingerprint anti-join then drops docs
     whose exact TEXT the corpus holds under another id (re-crawls get new
     ids; short texts also evade the shingle-based near-dup gate).
  3. ``minhash_incremental_pairs`` — near-dup the deduped batch against
     the STORED corpus signatures (computed once, parquet'd next to the
     snapshot; only the batch is hashed tonight) plus within the batch.
     Batch docs near-duplicating the corpus drop (the corpus copy wins);
     batch-batch pairs keep the smaller id.
  4. ``corpus_diff`` — publish snapshot v{N+1} = v{N} + survivors and the
     (key, status) audit against v{N}; a nightly run only ever reports
     ``added``/``unchanged``.

At 100 TB: the landing zone is an object-store prefix, signatures are a
~0.5 KB/doc sidecar table, and tonight's cost is O(|batch|) hashing + one
batch-vs-corpus band join (broadcast-able when the batch is small) — the
corpus is never re-self-joined and its text is never re-read (the diff
joins stored fingerprint-sized columns only).

    python examples/nightly_increment.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling examples

from pyspark.sql import DataFrame, functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
    doc_fingerprint_nullsafe,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    exact_dedup,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    minhash_incremental_pairs,
    minhash_signatures,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.pairing import (
    corpus_diff,
    skip_existing_bloom,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
    split_corrupt,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming import (
    read_committed_batches,
)


def _corpus_fs(spark, corpus_dir: str):
    """Hadoop FS handle + path factory for the corpus dir (scheme-agnostic:
    file:, hdfs:, s3a: — same pattern as the landing zone's sink)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.sinks import (
        IdempotentParquetBatchWriter,
    )

    w = IdempotentParquetBatchWriter(corpus_dir)
    return w._fs(spark), (lambda p: w._hpath(spark, p))


def mark_version_committed(spark, corpus_dir: str, version: int) -> None:
    """Atomic publish commit: the marker is written only after ALL of a
    version's artifacts (snapshot + both sidecars + diff + pairs) landed —
    the per-version twin of the landing zone's per-batch ``_COMMITTED``.
    A publisher crash between artifact writes leaves an unmarked (hence
    invisible) version; re-running the same night overwrites every
    artifact and then marks, so recovery is a plain re-run."""
    fs, hpath = _corpus_fs(spark, corpus_dir)
    fs.mkdirs(hpath(f"{corpus_dir}/manifest"))
    fs.create(hpath(f"{corpus_dir}/manifest/v{version}_COMMITTED"), True).close()


def is_version_committed(spark, corpus_dir: str, version: int) -> bool:
    fs, hpath = _corpus_fs(spark, corpus_dir)
    return fs.exists(hpath(f"{corpus_dir}/manifest/v{version}_COMMITTED"))


def unmark_version(spark, corpus_dir: str, version: int) -> None:
    """Retract a version's commit marker BEFORE overwriting its artifacts.

    The 'unmarked version = invisible' crash-safety invariant only holds
    for first-time publishes; a scheduler retry of a night whose target
    version is ALREADY committed (a success it failed to record) would
    otherwise overwrite the artifacts under a live marker — parquet
    overwrite is delete-then-write, so a crash mid-overwrite would leave a
    marked-committed version with missing artifacts. Deleting the marker
    first puts the whole overwrite window back under the marker protocol."""
    fs, hpath = _corpus_fs(spark, corpus_dir)
    marker = hpath(f"{corpus_dir}/manifest/v{version}_COMMITTED")
    if fs.exists(marker) and not fs.delete(marker, False):
        # Hadoop FileSystem.delete signals failure by returning False, not
        # raising; proceeding would overwrite artifacts under a live marker
        # — exactly the crash window this retraction exists to close.
        raise IOError(f"failed to retract commit marker {marker}")


def bootstrap_corpus(spark, docs: DataFrame, corpus_dir: str) -> int:
    """Version 0: seed the curated corpus and its two sidecars — MinHash
    signatures (near-dup gate) and exact-text fingerprints (re-crawl
    gate). Both are computed ONCE per doc here and extended incrementally
    at publish time, so no nightly run ever re-reads the corpus text."""
    unmark_version(spark, corpus_dir, 0)  # re-bootstrap = retracted commit
    docs.write.mode("overwrite").parquet(f"{corpus_dir}/snapshot/v0")
    snap = spark.read.parquet(f"{corpus_dir}/snapshot/v0")
    minhash_signatures(snap.select("doc_id", "text")).write.mode(
        "overwrite"
    ).parquet(f"{corpus_dir}/signatures/v0")
    snap.select(
        "doc_id", doc_fingerprint_nullsafe(F.col("text")).alias("fp")
    ).write.mode("overwrite").parquet(f"{corpus_dir}/fingerprints/v0")
    mark_version_committed(spark, corpus_dir, 0)
    return 0


def nightly_increment(
    spark,
    landing_sink: str,
    corpus_dir: str,
    version: int,
    threshold: float = 0.5,
) -> dict:
    """Run one night: returns the stage counts a scheduler would log.
    Reads snapshot/signatures/fingerprints v{version}, writes v{version+1}
    and marks it committed LAST (crash mid-publish = unmarked = invisible;
    recovery = re-run the same night)."""
    if not is_version_committed(spark, corpus_dir, version):
        raise ValueError(
            f"corpus version v{version} is not committed — a previous "
            "publish crashed mid-write; re-run the night that produces it "
            "(or bootstrap) before consuming it"
        )
    snap = spark.read.parquet(f"{corpus_dir}/snapshot/v{version}")
    stored_sigs = spark.read.parquet(f"{corpus_dir}/signatures/v{version}")
    stored_fps = spark.read.parquet(f"{corpus_dir}/fingerprints/v{version}")

    # 1. tonight's landing zone (only committed batches are visible).
    # "No drops tonight" is a normal scheduler outcome, not an error: keep
    # the current version (no new snapshot — republishing an identical
    # corpus would burn a version number and a full copy) and report a
    # no-op so the scheduler's log still shows the run happened. A MISSING
    # zone root is different — a misconfigured sink path must stay loud,
    # and the reader distinguishes it (FileNotFoundError, filesystem-API
    # based so object-store URIs work) from the quiet-night ValueError.
    try:
        landed = read_committed_batches(spark, landing_sink).drop("batch_id")
    except ValueError:
        return {
            "landed": 0,
            "corrupt": 0,
            "fresh_after_skip_and_exact": 0,
            "near_dup_pairs": 0,
            "near_dup_losers": 0,
            "published": 0,
            "diff": {},
            "version": version,
        }
    clean, corrupt = split_corrupt(landed)

    # 2. skip-if-exists through the bloom pre-filter, in-batch exact dedup
    # (two identical crawls of the same page tonight), THEN batch-vs-corpus
    # exact-text check: a curated page re-landing under a NEW id passes the
    # id-keyed bloom and — if too short to shingle — the near-dup gate too,
    # so the fingerprint anti-join is the only thing standing between it
    # and a permanent duplicate. The corpus side is the STORED fingerprint
    # sidecar (computed once per doc, like the signatures) — tonight's cost
    # stays O(|batch|); the corpus text is never re-read.
    batch_deduped = exact_dedup(
        skip_existing_bloom(clean, snap.select("doc_id"), key="doc_id")
    )
    # keep _fp on the survivors: the publish step stores the SAME column in
    # the sidecar, so the gate value and the stored value can never drift
    # (and the batch text is fingerprinted once, not re-hashed at publish)
    fresh = (
        batch_deduped.withColumn("_fp", doc_fingerprint_nullsafe(F.col("text")))
        .join(stored_fps.select(F.col("fp").alias("_fp")), "_fp", "left_anti")
        .persist()
    )
    # unpersist in a finally: a scheduler runs many nights in one session,
    # and an exception between persist() and the trailing unpersist (e.g. a
    # failed parquet write) would otherwise leak cached blocks for the
    # session's lifetime
    persisted = [fresh]
    try:
        return _near_dup_and_publish(
            spark, corpus_dir, version, threshold,
            landed, corrupt, fresh, snap, stored_sigs, stored_fps, persisted,
        )
    finally:
        for df in persisted:
            df.unpersist()


# Test seam: invoked with the artifact name after each publish write (and
# never in production paths — the default is a no-op). Crash-injection
# tests monkeypatch this to kill the publisher after an arbitrary PREFIX
# of the five artifact writes, proving every half-published state is
# invisible (marker written last) and recoverable by a plain re-run.
def _after_artifact_write(artifact: str) -> None:
    return None


def _near_dup_and_publish(
    spark, corpus_dir, version, threshold,
    landed, corrupt, fresh, snap, stored_sigs, stored_fps, persisted,
) -> dict:
    # 3. near-dup the batch against STORED corpus signatures; only the
    # batch is hashed tonight
    batch_sigs = minhash_signatures(fresh.select("doc_id", "text")).persist()
    persisted.append(batch_sigs)
    pairs = minhash_incremental_pairs(
        batch_sigs, stored_sigs, threshold=threshold
    ).persist()
    persisted.append(pairs)
    # losers: per pair, the batch-side id with the larger value when both
    # are batch ids (keep-first, deterministic), else the (single) batch
    # id when the other side is corpus. Corpus ids never drop.
    batch_set = fresh.select("doc_id")
    p = (
        pairs.join(
            batch_set.select(F.col("doc_id").alias("id1"), F.lit(True).alias("_b1")),
            "id1",
            "left",
        ).join(
            batch_set.select(F.col("doc_id").alias("id2"), F.lit(True).alias("_b2")),
            "id2",
            "left",
        )
    )
    losers = p.select(
        F.when(F.col("_b1") & F.col("_b2"), F.greatest("id1", "id2"))
        .when(F.col("_b1"), F.col("id1"))
        .otherwise(F.col("id2"))
        .alias("doc_id")
    ).distinct()
    survivors = fresh.join(losers, "doc_id", "left_anti").persist()
    persisted.append(survivors)

    # 4. publish v{N+1}: snapshot, signature sidecar (stored ∪ survivors'),
    # and the (key, status) audit. Retract any pre-existing v{N+1} marker
    # FIRST (scheduler retry of an already-committed night) so the
    # overwrite window is covered by the marker protocol.
    nv = version + 1
    unmark_version(spark, corpus_dir, nv)
    snap.unionByName(survivors.select(*snap.columns)).write.mode(
        "overwrite"
    ).parquet(f"{corpus_dir}/snapshot/v{nv}")
    _after_artifact_write("snapshot")
    stored_sigs.unionByName(
        batch_sigs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    ).write.mode("overwrite").parquet(f"{corpus_dir}/signatures/v{nv}")
    _after_artifact_write("signatures")
    stored_fps.unionByName(
        survivors.select("doc_id", F.col("_fp").alias("fp"))
    ).write.mode("overwrite").parquet(f"{corpus_dir}/fingerprints/v{nv}")
    _after_artifact_write("fingerprints")
    # diff from the fingerprint SIDECARS, not the snapshots: the audit is
    # then O(keys) — corpus text is never re-read by a nightly run, which
    # is the whole point of maintaining the sidecar
    new_fps = spark.read.parquet(f"{corpus_dir}/fingerprints/v{nv}")
    diff = corpus_diff(stored_fps, new_fps, fingerprint_col="fp")
    diff.write.mode("overwrite").parquet(f"{corpus_dir}/diff/v{nv}")
    _after_artifact_write("diff")
    # pair audit: which near-dups tonight's batch hit (and lost to) — the
    # log a curation team reviews when a source suddenly collapses
    pairs.write.mode("overwrite").parquet(f"{corpus_dir}/pairs/v{nv}")
    _after_artifact_write("pairs")
    # commit LAST: all five artifacts are on disk, v{nv} becomes visible
    mark_version_committed(spark, corpus_dir, nv)

    counts = {
        "landed": landed.count(),
        "corrupt": corrupt.count(),
        "fresh_after_skip_and_exact": fresh.count(),
        "near_dup_pairs": pairs.count(),
        "near_dup_losers": losers.count(),
        "published": survivors.count(),
        "diff": {
            r["status"]: r["count"]
            for r in spark.read.parquet(f"{corpus_dir}/diff/v{nv}")
            .groupBy("status")
            .count()
            .collect()
        },
        "version": nv,
    }
    return counts


def main() -> None:
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="vlds-nightly-increment")
    work = tempfile.mkdtemp(prefix="vlds_nightly_")
    corpus_dir = os.path.join(work, "corpus")

    # bootstrap: even docs are the existing curated corpus
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v = bootstrap_corpus(spark, docs.filter(F.col("doc_id") % 2 == 0), corpus_dir)

    # tonight's drop: ALL docs land (odd = genuinely new, even = replays
    # the bloom must skip) — reuse the streaming ingester end-to-end
    from ingest_stream import ingest, seed_landing_dir

    landing, sink, ckpt = (os.path.join(work, d) for d in ("landing", "zone", "ckpt"))
    seed_landing_dir(spark, sf_dir, landing, n_files=3)
    ingest(spark, landing, sink, ckpt)

    counts = nightly_increment(spark, sink, corpus_dir, v)
    print("night 1:", counts)

    # night 2 on the SAME landing zone: everything already curated — the
    # increment must be empty and the diff all-unchanged
    counts2 = nightly_increment(spark, sink, corpus_dir, counts["version"])
    print("night 2:", counts2)


if __name__ == "__main__":
    main()
