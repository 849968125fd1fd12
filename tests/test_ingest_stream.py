"""Streaming ingestion end-to-end (examples/ingest_stream.py): JSONL drops
-> corrupt-line ledger -> exactly-once landing zone -> committed-batch read
-> skip-if-exists incremental curation. Includes a crash-replay: a batch
whose sink commit AND checkpoint commit both vanished is replayed by the
restarted query and overwritten idempotently."""

import importlib.util
import os
import shutil

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming import (
    read_committed_batches,
)


def _example():
    path = os.path.join(os.path.dirname(__file__), "..", "examples", "ingest_stream.py")
    spec = importlib.util.spec_from_file_location("ingest_stream", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def zone(spark, sf_dir, tmp_path_factory):
    """Seed 3 JSONL drops (one corrupt line each), drain them one file per
    micro-batch into the exactly-once sink."""
    mod = _example()
    work = tmp_path_factory.mktemp("ingest")
    landing, sink, ckpt = (str(work / d) for d in ("landing", "zone", "ckpt"))
    mod.seed_landing_dir(spark, sf_dir, landing, n_files=3)
    mod.ingest(spark, landing, sink, ckpt, max_files_per_trigger=1)
    return mod, landing, sink, ckpt


def test_three_committed_batches_cover_the_corpus(zone, spark, sf_dir):
    _, _, sink, _ = zone
    landed = read_committed_batches(spark, sink)
    ids = [r.batch_id for r in landed.select("batch_id").distinct().collect()]
    assert sorted(ids) == [0, 1, 2]
    n_docs = load_table(spark, sf_dir, "documents").count()
    # every document parsed clean exactly once; one corrupt line per file
    assert landed.filter(F.col("_corrupt_record").isNull()).count() == n_docs
    assert landed.filter(F.col("_corrupt_record").isNotNull()).count() == 3


def test_restart_on_drained_source_lands_nothing_new(zone, spark):
    mod, landing, sink, ckpt = zone
    before = read_committed_batches(spark, sink).count()
    mod.ingest(spark, landing, sink, ckpt)  # same checkpoint: no-op restart
    assert read_committed_batches(spark, sink).count() == before


def test_crash_replay_of_half_written_batch(zone, spark):
    """Simulate the worst crash window: batch 2's parquet landed but neither
    the sink's _COMMITTED marker nor the checkpoint's commit record made it.
    The restarted query must replay batch 2 (at-least-once) and the writer
    must overwrite the partial output (exactly-once)."""
    mod, landing, sink, ckpt = zone
    total = read_committed_batches(spark, sink).count()
    marker = os.path.join(sink, "batch_id=2", "_COMMITTED")
    os.remove(marker)
    ckpt_commit = os.path.join(ckpt, "commits", "2")
    assert os.path.exists(ckpt_commit)
    os.remove(ckpt_commit)
    # the local ChecksumFs keeps a .crc sidecar per file; a real HDFS/S3
    # crash loses both together, so drop it with the commit record (leaving
    # it makes the replayed commit's rename fail as a phantom conflict)
    crc = os.path.join(ckpt, "commits", ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)
    # scribble on the now-uncommitted dir so only a true overwrite can heal it
    with open(os.path.join(sink, "batch_id=2", "garbage.tmp"), "w") as f:
        f.write("partial")
    # uncommitted batch is invisible to the curation reader meanwhile
    assert read_committed_batches(spark, sink).count() < total

    mod.ingest(spark, landing, sink, ckpt)  # restart -> replays batch 2
    assert os.path.exists(marker)
    assert not os.path.exists(os.path.join(sink, "batch_id=2", "garbage.tmp"))
    assert read_committed_batches(spark, sink).count() == total


def test_curate_increment_skips_existing_and_dedups(zone, spark, sf_dir):
    mod, _, sink, _ = zone
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new_docs, corrupt = mod.curate_increment(spark, sink, existing)
    got_ids = {r.doc_id for r in new_docs.select("doc_id").collect()}
    # nothing already curated comes back; nothing outside the corpus appears
    assert all(i % 2 == 1 for i in got_ids)
    # exact dedup keeps min-id per distinct text among the odd docs
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    expect = {
        r["min(doc_id)"]
        for r in odd.groupBy("text").agg(F.min("doc_id")).collect()
    }
    assert got_ids == expect
    assert corrupt.count() == 3
    assert corrupt.columns == ["raw_line"]


def test_near_dedup_increment_finds_batch_vs_corpus_pairs(zone, spark, sf_dir):
    """The increment's near-dup check: odd (new) docs that near-duplicate
    even (curated) docs must pair, corpus-vs-corpus pairs must not appear."""
    mod, _, sink, _ = zone
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new_docs, _ = mod.curate_increment(spark, sink, existing)
    pairs = mod.near_dedup_increment(new_docs, existing, threshold=0.0).collect()
    new_ids = {r.doc_id for r in new_docs.select("doc_id").collect()}
    for r in pairs:
        assert r.id1 in new_ids or r.id2 in new_ids  # every pair touches the batch
        assert r.id1 < r.id2
