"""Training-shard sink: the last stage of the training-data pipeline.

After packing (``operators/packing.py``) every row carries a
``(shard, seq_id)`` bin assignment; a trainer wants each shard as one
sequentially-readable file whose rows arrive in bin order. This sink writes
``out_dir/shard=K/*.parquet`` with exactly one file per shard, rows sorted
by ``(seq_id, *order_cols)`` inside the file — so a data loader streams a
shard front-to-back and sees whole bins in packing order, no shuffle or
sort at training time.

Scale: write parallelism follows the shard count (``repartition(n_shards,
shard)`` — NOT the bare-column form, whose task count is capped at
``spark.sql.shuffle.partitions`` and would funnel millions of shards
through ~200 writer tasks). Hash partitioning means a task may own zero or
a couple of shards rather than exactly one, but ``partitionBy`` +
``sortWithinPartitions(shard, ...)`` keeps the per-shard contract either
way: one sorted file per shard directory. Shard count is the
parallelism/file-size knob — at 100 TB you size shards to the file size
your trainer streams well (hundreds of MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    packed: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    seq_col: str = "seq_id",
    order_cols: tuple[str, ...] = (),
    n_shards: int | None = None,
) -> None:
    """Write packed rows as ``out_dir/shard=K/`` parquet, one file per
    shard, sorted by ``(seq_col, *order_cols)`` within the file.

    ``order_cols`` breaks ties inside a bin (e.g. the packing id) so the
    written order is total and reruns are byte-stable. ``n_shards`` sets
    the writer-task count; callers that packed the data know it
    (``pack_sequences(n_shards=...)``) — when omitted it is derived with
    one map-side-combinable ``countDistinct`` pass over the shard column."""
    if n_shards is None:
        n_shards = packed.agg(F.countDistinct(shard_col)).first()[0] or 1
    (
        packed.repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, seq_col, *order_cols)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(out_dir)
    )


def read_training_shard(
    spark,
    out_dir: str,
    shard: int,
    seq_col: str = "seq_id",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Read one shard back, in written (bin) order.

    The file is written sorted, but a reader cannot lean on that alone: a
    shard larger than ``spark.sql.files.maxPartitionBytes`` is split into
    several read partitions whose packing order is an implementation
    detail, so ``coalesce(1)`` by itself could concatenate the splits out
    of offset order. The explicit ``sortWithinPartitions`` (sorting an
    already-sorted run — cheap) makes the ordering guarantee real at any
    shard size. (At training scale, loaders read the files directly — this
    helper is the verification path.)"""
    return (
        spark.read.parquet(f"{out_dir}/shard={shard}")
        .coalesce(1)
        .sortWithinPartitions(seq_col, *order_cols)
    )
