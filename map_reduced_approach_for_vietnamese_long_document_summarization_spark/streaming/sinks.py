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
zero-byte ``_COMMITTED`` marker is created only after the parquet write
finishes. Filesystem operations go through the Hadoop ``FileSystem`` API of
the batch's own session, so the same code addresses ``file:``, ``hdfs:``
or ``s3a:`` paths unchanged; everything runs on the driver (``foreachBatch``
executes there), the data write itself is the cluster-parallel
``DataFrameWriter``.

This is the streaming twin of ``sources/shards.py`` — the batch side writes
training shards once; this side lets a watermarked stream (events, incoming
documents) append to a corpus directory with replay safety, which is what
an ingestion pipeline needs before the batch dedup/pack stages pick the
data up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class IdempotentParquetBatchWriter:
    """``foreachBatch`` callable: idempotent per-batch parquet append.

    Exposed as a class (rather than a closure) so tests and recovery tools
    can invoke ``__call__(df, batch_id)`` directly to exercise or repair
    individual batches.
    """

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")

    # -- Hadoop FS helpers (driver-side, scheme-agnostic) ------------------
    def _fs(self, spark):
        jvm = spark._jvm
        uri = jvm.java.net.URI.create(self.path)
        return jvm.org.apache.hadoop.fs.FileSystem.get(
            uri, spark._jsc.hadoopConfiguration()
        )

    def _hpath(self, spark, p: str):
        return spark._jvm.org.apache.hadoop.fs.Path(p)

    def _batch_dir(self, batch_id: int) -> str:
        return f"{self.path}/batch_id={batch_id}"

    def committed(self, spark, batch_id: int) -> bool:
        fs = self._fs(spark)
        return fs.exists(self._hpath(spark, f"{self._batch_dir(batch_id)}/_COMMITTED"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.committed(spark, batch_id):
            return  # replay of a committed batch: exactly-once no-op
        out = self._batch_dir(batch_id)
        # overwrite clears any partial output from a crashed earlier attempt
        batch_df.write.mode("overwrite").parquet(out)
        fs = self._fs(spark)
        fs.create(self._hpath(spark, f"{out}/_COMMITTED"), True).close()


def write_stream_idempotent_parquet(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start an exactly-once parquet append of ``df`` under ``path``.

    Output lays out as ``path/batch_id=N/part-*.parquet`` — readable as one
    partitioned table (``spark.read.parquet(path)`` exposes ``batch_id``).
    ``available_now=True`` drains the source and stops (the batch-style
    backfill trigger); pass ``False`` for a continuously running query.
    """
    writer = df.writeStream.foreachBatch(IdempotentParquetBatchWriter(path)).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_committed_batches(spark, path: str) -> DataFrame:
    """Read ONLY the committed batches of an idempotent-sink directory.

    ``spark.read.parquet(path)`` would also surface a half-written batch
    left by a writer that crashed mid-write (its replay will overwrite it,
    but a reader racing that window shouldn't see it). This lists the
    ``batch_id=N`` partitions, keeps those with a ``_COMMITTED`` marker,
    and reads them with ``basePath`` so the ``batch_id`` partition column
    survives. Listing cost is one driver-side directory scan — batch count,
    not file count."""
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
