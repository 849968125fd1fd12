"""Training-shard sink: the last stage of the training-data pipeline.

After packing (``operators/packing.py``) every row carries a
``(shard, seq_id)`` bin assignment; a trainer wants each shard as one
sequentially-readable file whose rows arrive in bin order. This sink writes
``out_dir/shard=K/*.parquet`` with exactly one file per shard, rows sorted
by ``(seq_id, *order_cols)`` inside the file — so a data loader streams a
shard front-to-back and sees whole bins in packing order, no shuffle or
sort at training time.

Scale: one writer task per shard (the ``repartition(shard)`` aligns task
and output partitioning, so `partitionBy` doesn't split a shard across
tasks or re-shuffle). Shard count is the parallelism/file-size knob — at
100 TB you size shards to the file size your trainer streams well (hundreds
of MB), i.e. millions of shards, which is exactly as many write tasks.
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
) -> None:
    """Write packed rows as ``out_dir/shard=K/`` parquet, one file per
    shard, sorted by ``(seq_col, *order_cols)`` within the file.

    ``order_cols`` breaks ties inside a bin (e.g. the packing id) so the
    written order is total and reruns are byte-stable."""
    (
        packed.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, seq_col, *order_cols)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(out_dir)
    )


def read_training_shard(spark, out_dir: str, shard: int) -> DataFrame:
    """Read one shard back, in written (bin) order.

    Parquet readers may split or reorder files; a single shard is one file
    written in sorted order, so reading just that directory with one
    partition preserves it. (At training scale, loaders read the files
    directly — this helper is the verification path.)"""
    return spark.read.parquet(f"{out_dir}/shard={shard}").coalesce(1)
