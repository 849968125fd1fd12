"""Exactly-once foreachBatch parquet sink (streaming/sinks.py): replay of a
committed batch is a no-op, replay of a partial batch overwrites it, and the
committed-batches reader hides uncommitted partials."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming import (
    IdempotentParquetBatchWriter,
    read_committed_batches,
    read_events_stream,
    write_stream_idempotent_parquet,
)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "sink")


def test_stream_writes_all_rows_once(spark, sf_dir, out_dir):
    ckpt = out_dir + "-ckpt"
    q = write_stream_idempotent_parquet(
        read_events_stream(spark, sf_dir), out_dir, ckpt
    )
    q.awaitTermination(120)
    got = read_committed_batches(spark, out_dir)
    n_batch = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_batch
    assert "batch_id" in got.columns
    # restart from the same checkpoint: source is drained, nothing re-lands
    q2 = write_stream_idempotent_parquet(
        read_events_stream(spark, sf_dir), out_dir, ckpt
    )
    q2.awaitTermination(120)
    assert read_committed_batches(spark, out_dir).count() == n_batch


def test_replay_of_committed_batch_is_noop(spark, sf_dir, out_dir):
    writer = IdempotentParquetBatchWriter(out_dir)
    batch = load_table(spark, sf_dir, "events").limit(10)
    writer(batch, 0)
    files_before = sorted(os.listdir(os.path.join(out_dir, "batch_id=0")))
    # at-least-once replay hands the same batch id again — with MORE rows
    # visible it must still be a no-op (the first commit won)
    writer(load_table(spark, sf_dir, "events").limit(20), 0)
    assert sorted(os.listdir(os.path.join(out_dir, "batch_id=0"))) == files_before
    assert read_committed_batches(spark, out_dir).count() == 10


def test_replay_of_partial_batch_overwrites(spark, sf_dir, out_dir):
    writer = IdempotentParquetBatchWriter(out_dir)
    batch = load_table(spark, sf_dir, "events").limit(10)
    # simulate a crash mid-write: parquet landed, marker never did
    batch.write.mode("overwrite").parquet(os.path.join(out_dir, "batch_id=0"))
    marker = os.path.join(out_dir, "batch_id=0", "_COMMITTED")
    assert not os.path.exists(marker)
    with pytest.raises(ValueError):
        read_committed_batches(spark, out_dir)  # partial stays invisible
    writer(load_table(spark, sf_dir, "events").limit(7), 0)
    assert os.path.exists(marker)
    assert read_committed_batches(spark, out_dir).count() == 7


def test_reader_skips_uncommitted_alongside_committed(spark, sf_dir, out_dir):
    writer = IdempotentParquetBatchWriter(out_dir)
    ev = load_table(spark, sf_dir, "events")
    writer(ev.limit(5), 0)
    # batch 1 crashed before its marker
    ev.limit(3).write.mode("overwrite").parquet(os.path.join(out_dir, "batch_id=1"))
    got = read_committed_batches(spark, out_dir)
    assert got.count() == 5
    assert [r.batch_id for r in got.select("batch_id").distinct().collect()] == [0]


def test_batch_id_partition_prunes(spark, sf_dir, out_dir):
    writer = IdempotentParquetBatchWriter(out_dir)
    ev = load_table(spark, sf_dir, "events")
    writer(ev.limit(5), 0)
    writer(ev.limit(5), 1)
    got = read_committed_batches(spark, out_dir).filter(F.col("batch_id") == 1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert got.count() == 5


def test_new_checkpoint_on_old_sink_path_fails_loudly(spark, sf_dir, out_dir):
    """batch_ids are only unique per checkpoint: pointing a NEW checkpoint
    (fresh run_id) at a sink that already holds another run's batch 0 must
    raise, not treat the stale marker as this run's commit — the silent
    path would drop every colliding micro-batch of the new run."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.sinks import (
        run_id_for_checkpoint,
    )

    ev = load_table(spark, sf_dir, "events")
    old = IdempotentParquetBatchWriter(out_dir, run_id=run_id_for_checkpoint("/ckpt/a"))
    old(ev.limit(5), 0)
    new = IdempotentParquetBatchWriter(out_dir, run_id=run_id_for_checkpoint("/ckpt/b"))
    with pytest.raises(ValueError, match="different run"):
        new(ev.limit(3), 0)
    # the old run's data is untouched by the refused write
    assert read_committed_batches(spark, out_dir).count() == 5
    # same checkpoint (same run_id) still recognizes its own commit: no-op
    old(ev.limit(99), 0)
    assert read_committed_batches(spark, out_dir).count() == 5
    # a legacy adopter (run_id=None) accepts any marker, presence-only
    legacy = IdempotentParquetBatchWriter(out_dir)
    legacy(ev.limit(99), 0)
    assert read_committed_batches(spark, out_dir).count() == 5


def test_reader_on_missing_dir_raises_file_not_found(spark, tmp_path):
    """A missing ROOT is a misconfigured sink path (loud, distinct), not
    the quiet 'zero committed batches yet' ValueError an existing-but-empty
    zone raises — schedulers fold the latter into a no-op night."""
    with pytest.raises(FileNotFoundError, match="landing zone"):
        read_committed_batches(spark, str(tmp_path / "never-created"))


def test_reader_on_existing_empty_dir_raises_value_error(spark, tmp_path):
    empty = tmp_path / "empty-zone"
    empty.mkdir()
    with pytest.raises(ValueError, match="no committed batches"):
        read_committed_batches(spark, str(empty))
