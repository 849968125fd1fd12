"""Exactly-once streaming sinks: foreachBatch with idempotent commits.

Structured Streaming's ``foreachBatch`` contract is at-least-once: after a
failure the same micro-batch (same ``batch_id``) can be handed to the writer
again. Exactly-once therefore has to come from the writer — the standard
recipe is (a) key every output by the batch id and (b) make the commit of a
batch atomic and detectable, so a replay of an already-committed batch is a
no-op and a replay of a half-written batch overwrites the partial output.

``IdempotentParquetBatchWriter`` implements that recipe for a parquet
directory sink: each micro-batch lands in its own ``batch_id=N``
subdirectory (which doubles as a readable partition column), and a
``_COMMITTED`` marker is created only after the parquet write finishes.
Batch ids are only unique PER CHECKPOINT, so the marker also records a
``run_id`` (derived from the checkpoint path by the public helper): if the
sink path is later reused with a different checkpoint — where batch ids
restart at 0 — the stale marker is detected and the writer fails loudly
instead of silently skipping (and so losing) the new run's micro-batches.
Filesystem operations go through the Hadoop ``FileSystem`` API of the
batch's own session, so the same code addresses ``file:``, ``hdfs:`` or
``s3a:`` paths unchanged; everything runs on the driver (``foreachBatch``
executes there), the data write itself is the cluster-parallel
``DataFrameWriter``.

This is the streaming twin of ``sources/shards.py`` — the batch side writes
training shards once; this side lets a watermarked stream (events, incoming
documents) append to a corpus directory with replay safety, which is what
an ingestion pipeline needs before the batch dedup/pack stages pick the
data up.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class IdempotentParquetBatchWriter:
    """``foreachBatch`` callable: idempotent per-batch parquet append.

    Exposed as a class (rather than a closure) so tests and recovery tools
    can invoke ``__call__(df, batch_id)`` directly to exercise or repair
    individual batches.

    ``run_id`` names the (sink, checkpoint) pairing; committed-markers are
    stamped with it and a marker from a DIFFERENT run raises instead of
    being treated as this run's commit — the silent-data-loss hazard of
    batch-id-keyed markers when a sink path outlives its checkpoint.
    ``None`` skips the check (legacy sinks written before markers carried a
    run id).
    """

    def __init__(self, path: str, run_id: str | None = None) -> None:
        self.path = path.rstrip("/")
        self.run_id = run_id

    # -- Hadoop FS helpers (driver-side, scheme-agnostic) ------------------
    def _fs(self, spark):
        # resolve via Path, not java.net.URI.create: Path accepts raw
        # filesystem paths with URI-illegal characters (spaces, ...)
        return self._hpath(spark, self.path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def _hpath(self, spark, p: str):
        return spark._jvm.org.apache.hadoop.fs.Path(p)

    def _batch_dir(self, batch_id: int) -> str:
        return f"{self.path}/batch_id={batch_id}"

    def _marker(self, spark, batch_id: int):
        return self._hpath(spark, f"{self._batch_dir(batch_id)}/_COMMITTED")

    def _read_marker(self, spark, fs, marker) -> str:
        jvm = spark._jvm
        stream = fs.open(marker)
        try:
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            return reader.readLine() or ""
        finally:
            stream.close()

    def committed(self, spark, batch_id: int) -> bool:
        fs = self._fs(spark)
        marker = self._marker(spark, batch_id)
        if not fs.exists(marker):
            return False
        if self.run_id is None:
            return True
        stamped = self._read_marker(spark, fs, marker)
        if stamped == self.run_id:
            return True
        raise ValueError(
            f"batch {batch_id} under {self.path!r} carries a commit marker "
            f"from a different run ({stamped or 'no run id'!s} != "
            f"{self.run_id}) — the sink path is being reused with a new "
            "checkpoint, whose batch ids restart at 0; treating the stale "
            "marker as committed would silently drop this run's data. Use "
            "a fresh sink path, or pass run_id=None to adopt a legacy sink"
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.committed(spark, batch_id):
            return  # replay of a committed batch: exactly-once no-op
        out = self._batch_dir(batch_id)
        # overwrite clears any partial output from a crashed earlier attempt
        batch_df.write.mode("overwrite").parquet(out)
        fs = self._fs(spark)
        stream = fs.create(self._marker(spark, batch_id), True)
        try:
            if self.run_id is not None:
                stream.write(bytearray(self.run_id.encode("utf-8")))
        finally:
            stream.close()


def run_id_for_checkpoint(checkpoint_dir: str) -> str:
    """Stable run identity for a (sink, checkpoint) pairing: restarts of
    the same checkpoint keep it (their batch-id sequence continues, so
    replays must be recognized), while a new checkpoint gets a new one."""
    return hashlib.sha256(checkpoint_dir.rstrip("/").encode("utf-8")).hexdigest()[:16]


def write_stream_idempotent_parquet(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start an exactly-once parquet append of ``df`` under ``path``.

    Output lays out as ``path/batch_id=N/part-*.parquet`` — readable as one
    partitioned table (``spark.read.parquet(path)`` exposes ``batch_id``).
    Markers are stamped with ``run_id_for_checkpoint(checkpoint_dir)``, so
    pointing a NEW checkpoint at an old sink path fails loudly instead of
    silently dropping batches whose ids collide with the old run's.
    ``available_now=True`` drains the source and stops (the batch-style
    backfill trigger); pass ``False`` for a continuously running query.
    """
    writer = df.writeStream.foreachBatch(
        IdempotentParquetBatchWriter(path, run_id=run_id_for_checkpoint(checkpoint_dir))
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_committed_batches(spark, path: str) -> DataFrame:
    """Read ONLY the committed batches of an idempotent-sink directory.

    ``spark.read.parquet(path)`` would also surface a half-written batch
    left by a writer that crashed mid-write (its replay will overwrite it,
    but a reader racing that window shouldn't see it). This lists the
    ``batch_id=N`` partitions, keeps those with a ``_COMMITTED`` marker
    (any run's — readers consume data, not run identity), and reads them
    with ``basePath`` so the ``batch_id`` partition column survives.
    Listing cost is one driver-side directory scan — batch count, not file
    count."""
    w = IdempotentParquetBatchWriter(path)
    fs = w._fs(spark)
    root = w._hpath(spark, w.path)
    if not fs.exists(root):
        # DISTINCT from "zero committed batches": a zone that exists but
        # holds nothing yet is a quiet night a scheduler may treat as a
        # no-op, while a missing root is a misconfigured sink path that
        # must stay loud (works for any Hadoop filesystem — local, HDFS,
        # object stores — unlike an os.path check)
        raise FileNotFoundError(
            f"landing zone {path!r} does not exist — check the sink path"
        )
    committed = []
    for status in fs.listStatus(root):
        p = status.getPath()
        if status.isDirectory() and p.getName().startswith("batch_id="):
            if fs.exists(w._hpath(spark, f"{p.toString()}/_COMMITTED")):
                committed.append(p.toString())
    if not committed:
        raise ValueError(f"no committed batches under {path}")
    return spark.read.option("basePath", w.path).parquet(*sorted(committed))
