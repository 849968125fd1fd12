"""Nightly incremental-curation composition (examples/nightly_increment.py):
streaming ingest -> bloom skip-if-exists -> incremental MinHash vs STORED
signatures -> keep-first drop -> snapshot publish + corpus_diff audit.

The load-bearing assertion is the minhash_incremental_pairs contract ON THE
COMPOSITION: the pairs the nightly run logged equal a full-corpus near-dup
recompute (corpus ∪ batch self-join) restricted to pairs touching a batch
id — i.e. the increment missed nothing a full rebuild would have found."""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    minhash_dedup_pairs,
    unpersist_inputs,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
)


def _mod(name):
    path = os.path.join(os.path.dirname(__file__), "..", "examples", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def nightly(spark, sf_dir, tmp_path_factory):
    """Bootstrap (even docs curated), ingest one full drop, run two nights."""
    nightly_mod = _mod("nightly_increment")
    ingest_mod = _mod("ingest_stream")
    work = tmp_path_factory.mktemp("nightly")
    corpus_dir = str(work / "corpus")
    landing, sink, ckpt = (str(work / d) for d in ("landing", "zone", "ckpt"))

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v0 = nightly_mod.bootstrap_corpus(
        spark, docs.filter(F.col("doc_id") % 2 == 0), corpus_dir
    )
    ingest_mod.seed_landing_dir(spark, sf_dir, landing, n_files=3)
    ingest_mod.ingest(spark, landing, sink, ckpt)
    c1 = nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    c2 = nightly_mod.nightly_increment(spark, sink, corpus_dir, c1["version"])
    return nightly_mod, corpus_dir, c1, c2, sink, str(work)


def test_night1_counts_consistent(nightly, spark):
    _, corpus_dir, c1, _, _, _ = nightly
    assert c1["corrupt"] == 3
    assert c1["published"] == c1["fresh_after_skip_and_exact"] - c1["near_dup_losers"]
    # the audit artifacts agree with the counts
    assert c1["diff"].get("added", 0) == c1["published"]
    assert c1["diff"].get("removed", 0) == 0 and c1["diff"].get("changed", 0) == 0
    snap0 = spark.read.parquet(f"{corpus_dir}/snapshot/v0")
    assert c1["diff"]["unchanged"] == snap0.count()


def test_snapshot_and_signatures_stay_in_lockstep(nightly, spark):
    """Every published doc has exactly one stored signature and vice versa
    — the sidecar invariant the next night's increment depends on."""
    _, corpus_dir, c1, _, _, _ = nightly
    nv = c1["version"]
    snap = spark.read.parquet(f"{corpus_dir}/snapshot/v{nv}")
    sigs = spark.read.parquet(f"{corpus_dir}/signatures/v{nv}")
    fps = spark.read.parquet(f"{corpus_dir}/fingerprints/v{nv}")
    assert snap.count() == snap.select("doc_id").distinct().count()
    for side in (sigs, fps):
        assert side.count() == side.select("doc_id").distinct().count()
        assert snap.join(side, "doc_id", "left_anti").count() == 0
        assert side.join(snap, "doc_id", "left_anti").count() == 0


def test_increment_pairs_equal_full_recompute_restricted(nightly, spark, sf_dir):
    """The minhash_incremental_pairs contract on the composed run: logged
    pairs == full (corpus ∪ batch) self-join pairs touching a batch id."""
    _, corpus_dir, c1, _, _, _ = nightly
    nv = c1["version"]
    snap0 = spark.read.parquet(f"{corpus_dir}/snapshot/v0")
    logged = {
        (r.id1, r.id2)
        for r in spark.read.parquet(f"{corpus_dir}/pairs/v{nv}").collect()
    }
    # the batch the run near-dup'd = published survivors + the losers; both
    # are recoverable: survivors are v1-added docs, losers are batch-side
    # pair endpoints that never published. Reconstruct the batch universe
    # instead from first principles: corpus v0 ∪ (fresh batch), where fresh
    # batch = all pair endpoints not in v0 plus the published docs.
    added = spark.read.parquet(f"{corpus_dir}/diff/v{nv}").filter(
        F.col("status") == "added"
    )
    snap1 = spark.read.parquet(f"{corpus_dir}/snapshot/v{nv}")
    published = snap1.join(added.select(F.col("doc_id")), "doc_id", "left_semi")
    endpoint_ids = {i for p in logged for i in p}
    corpus_ids = {r.doc_id for r in snap0.select("doc_id").collect()}
    batch_loser_ids = endpoint_ids - corpus_ids
    published_ids = {r.doc_id for r in published.select("doc_id").collect()}
    batch_ids = batch_loser_ids | published_ids

    # full recompute over corpus ∪ batch (losers included — they were part
    # of tonight's batch even though they didn't publish)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    universe = docs.filter(
        F.col("doc_id").isin(list(corpus_ids | batch_ids))
    )
    full = minhash_dedup_pairs(universe, threshold=0.5)
    full_restricted = {
        (r.id1, r.id2)
        for r in full.collect()
        if r.id1 in batch_ids or r.id2 in batch_ids
    }
    unpersist_inputs(full)
    assert logged == full_restricted


def test_recrawl_under_new_id_never_publishes(nightly, spark, sf_dir):
    """A curated page re-landing under a NEW doc_id must not re-enter the
    corpus: it passes the id-keyed bloom, has no in-batch exact twin, and —
    when too short to shingle — evades the MinHash gate too; the
    fingerprint anti-join is the gate that catches it. Plant exactly that:
    bootstrap a corpus whose ids are shifted (disjoint from the landing
    zone's) but whose TEXTS include every even doc's text."""
    nightly_mod, _, _, _, sink, work = nightly
    corpus_dir = os.path.join(work, "corpus_recrawl")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    shifted = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    v0 = nightly_mod.bootstrap_corpus(spark, shifted, corpus_dir)
    c = nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    added = spark.read.parquet(f"{corpus_dir}/diff/v1").filter(
        F.col("status") == "added"
    )
    snap1 = spark.read.parquet(f"{corpus_dir}/snapshot/v1")
    published = snap1.join(added, "doc_id", "left_semi")
    # no published doc's text may byte-equal a curated doc's text
    dup_texts = published.join(
        shifted.select("text").distinct(), "text", "left_semi"
    )
    assert dup_texts.count() == 0
    # and every landed even doc WAS dropped by the fingerprint gate, not
    # published under its new (original) id
    even_ids = published.filter(F.col("doc_id") % 2 == 0).count()
    assert even_ids == 0
    assert c["published"] == added.count()


def test_empty_landing_zone_is_a_graceful_noop(nightly, spark, tmp_path):
    """'No drops tonight' must not crash the scheduled run OR burn a
    version: same version comes back, no new snapshot is written."""
    nightly_mod, corpus_dir, _, c2, _, _ = nightly
    empty = tmp_path / "empty_zone"
    empty.mkdir()
    v = c2["version"]
    c = nightly_mod.nightly_increment(spark, str(empty), corpus_dir, v)
    assert c["version"] == v and c["published"] == 0 and c["landed"] == 0
    assert not os.path.exists(f"{corpus_dir}/snapshot/v{v + 1}")
    # a MISSING zone is a misconfigured sink path, not a quiet night —
    # folding it into the no-op would report eternal success while no
    # data ever flows
    with pytest.raises(FileNotFoundError, match="landing zone"):
        nightly_mod.nightly_increment(
            spark, str(tmp_path / "no_such_zone"), corpus_dir, v
        )


def test_text_fingerprint_sentinel_catches_null_text(spark):
    """doc_fingerprint(NULL) is NULL and NULL keys never match an
    anti-join — the sentinel is what stops a NULL-text doc re-publishing
    under a fresh id every night. Empty text must stay distinct from NULL
    (md5('') is a real value)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
        NULL_TEXT_FINGERPRINT,
        doc_fingerprint_nullsafe,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "doc_id long, text string"
    )
    fps = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", doc_fingerprint_nullsafe(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] == NULL_TEXT_FINGERPRINT
    assert fps[2] != fps[1] and fps[3] != fps[1] and fps[2] != fps[3]
    # the anti-join actually drops a re-landing NULL-text doc
    batch = df.withColumn("_fp", doc_fingerprint_nullsafe(F.col("text")))
    stored = spark.createDataFrame([(NULL_TEXT_FINGERPRINT,)], "fp string")
    kept = batch.join(
        stored.select(F.col("fp").alias("_fp")), "_fp", "left_anti"
    )
    assert {r.doc_id for r in kept.collect()} == {2, 3}


def test_crashed_publish_is_invisible_and_rerunnable(nightly, spark, sf_dir):
    """The per-version commit marker is written after ALL artifacts: a
    crash mid-publish (marker + one sidecar missing) makes the version
    loudly unconsumable, and recovery is re-running the same night — every
    artifact write is overwrite-mode, so the rebuild is byte-deterministic."""
    import shutil

    nightly_mod, _, _, _, sink, work = nightly
    corpus_dir = os.path.join(work, "corpus_crash")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v0 = nightly_mod.bootstrap_corpus(
        spark, docs.filter(F.col("doc_id") % 2 == 0), corpus_dir
    )
    c1 = nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    assert nightly_mod.is_version_committed(spark, corpus_dir, 1)

    # simulate the publisher dying between the fingerprint write and the
    # marker: v1 loses its marker AND a sidecar
    os.remove(os.path.join(corpus_dir, "manifest", "v1_COMMITTED"))
    shutil.rmtree(os.path.join(corpus_dir, "fingerprints", "v1"))
    with pytest.raises(ValueError, match="not committed"):
        nightly_mod.nightly_increment(spark, sink, corpus_dir, 1)

    # recovery: re-run the night that produces v1
    c1b = nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    assert c1b == c1
    assert nightly_mod.is_version_committed(spark, corpus_dir, 1)
    fps = spark.read.parquet(f"{corpus_dir}/fingerprints/v1")
    snap = spark.read.parquet(f"{corpus_dir}/snapshot/v1")
    assert fps.count() == snap.count()


def test_retry_of_committed_night_retracts_marker_first(nightly, spark, sf_dir):
    """A scheduler retry of a night whose target version is ALREADY
    committed (a success it failed to record) overwrites the artifacts —
    parquet overwrite is delete-then-write, so the marker must be retracted
    BEFORE the first artifact write or a crash mid-overwrite leaves a
    marked-committed version with missing artifacts. Inject a crash during
    the retry's publish and assert the marker is already gone; then the
    plain re-run recovers."""
    nightly_mod, _, _, _, sink, work = nightly
    corpus_dir = os.path.join(work, "corpus_retry")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v0 = nightly_mod.bootstrap_corpus(
        spark, docs.filter(F.col("doc_id") % 2 == 0), corpus_dir
    )
    c1 = nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    assert nightly_mod.is_version_committed(spark, corpus_dir, 1)

    # retry the SAME night, but die mid-publish (corpus_diff runs after the
    # snapshot/sidecar overwrites, before the marker write)
    real_diff = nightly_mod.corpus_diff

    def _boom(*a, **k):
        raise RuntimeError("injected publisher crash")

    nightly_mod.corpus_diff = _boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    finally:
        nightly_mod.corpus_diff = real_diff
    # the crash window is covered: v1 is unmarked, hence invisible
    assert not nightly_mod.is_version_committed(spark, corpus_dir, 1)
    with pytest.raises(ValueError, match="not committed"):
        nightly_mod.nightly_increment(spark, sink, corpus_dir, 1)

    # recovery is the plain re-run; counts are byte-deterministic
    c1b = nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    assert c1b == c1
    assert nightly_mod.is_version_committed(spark, corpus_dir, 1)


@pytest.mark.parametrize("kill_after", ["snapshot", "pairs"])
def test_mid_publish_kill_recovers_exactly(nightly, spark, sf_dir, kill_after):
    """VERDICT r6 item 5: kill the publisher DURING a first-time publish —
    between artifact writes and the marker — via the _after_artifact_write
    seam, at the two boundary prefixes: right after the FIRST artifact
    (snapshot only on disk) and right after the LAST artifact before the
    marker (everything on disk but uncommitted). Both half-published
    states must be invisible to readers, the re-run must republish v1
    byte-for-byte (identical counts, snapshot, fingerprints), and night 2
    must then run normally on top."""
    nightly_mod, _, _, _, sink, work = nightly
    corpus_dir = os.path.join(work, f"corpus_kill_{kill_after}")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v0 = nightly_mod.bootstrap_corpus(
        spark, docs.filter(F.col("doc_id") % 2 == 0), corpus_dir
    )

    real_seam = nightly_mod._after_artifact_write

    def _kill(artifact):
        if artifact == kill_after:
            raise RuntimeError(f"injected kill after {artifact} write")

    nightly_mod._after_artifact_write = _kill
    try:
        with pytest.raises(RuntimeError, match="injected kill"):
            nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    finally:
        nightly_mod._after_artifact_write = real_seam

    # the half-published v1 is invisible: no marker, and any reader
    # consuming v1 (night 2's precondition check) refuses loudly
    assert not nightly_mod.is_version_committed(spark, corpus_dir, 1)
    with pytest.raises(ValueError, match="not committed"):
        nightly_mod.nightly_increment(spark, sink, corpus_dir, 1)

    # recovery = plain re-run of the same night; compare against a clean
    # run in a pristine corpus (same bootstrap, same landing zone)
    ref_dir = os.path.join(work, f"corpus_ref_{kill_after}")
    nightly_mod.bootstrap_corpus(
        spark, docs.filter(F.col("doc_id") % 2 == 0), ref_dir
    )
    c_ref = nightly_mod.nightly_increment(spark, sink, ref_dir, v0)
    c1 = nightly_mod.nightly_increment(spark, sink, corpus_dir, v0)
    assert c1 == c_ref
    assert nightly_mod.is_version_committed(spark, corpus_dir, 1)
    for artifact in ("snapshot", "fingerprints"):
        got = spark.read.parquet(f"{corpus_dir}/{artifact}/v1")
        want = spark.read.parquet(f"{ref_dir}/{artifact}/v1")
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    # night N+1 proceeds normally on the recovered version
    c2 = nightly_mod.nightly_increment(spark, sink, corpus_dir, c1["version"])
    assert c2["version"] == 2 and c2["published"] == 0


def test_night2_is_a_noop_publish(nightly):
    """Replaying the same landing zone publishes nothing: the bloom skips
    every curated doc, the near-dup gate re-rejects last night's losers,
    and the diff is all-unchanged."""
    _, _, c1, c2, _, _ = nightly
    assert c2["published"] == 0
    assert set(c2["diff"]) == {"unchanged"}
    # the only docs surviving the bloom are night-1's near-dup losers —
    # they are not in the corpus, so they land again and lose again
    assert c2["fresh_after_skip_and_exact"] == c1["near_dup_losers"]
    assert c2["near_dup_losers"] == c2["fresh_after_skip_and_exact"]
