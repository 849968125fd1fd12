"""Training-shard sink: one file per shard, bin-ordered rows, byte-stable."""

import glob

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    pack_sequences,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    read_training_shard,
    write_training_shards,
)


def _packed(spark, n_docs=40, n_shards=4):
    docs = spark.createDataFrame(
        [(i, 30 + (i * 7) % 50) for i in range(n_docs)], "doc_id long, n_tokens int"
    )
    return pack_sequences(docs, max_tokens=128, n_shards=n_shards, mode="greedy")


def test_one_file_per_shard_and_partition_dirs(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(_packed(spark), out, order_cols=("doc_id",))
    dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["0", "1", "2", "3"]
    for d in dirs:
        files = [f for f in glob.glob(f"{d}/*.parquet") if "_SUCCESS" not in f]
        assert len(files) == 1, f"{d}: expected one file, got {files}"


def test_shard_rows_arrive_in_bin_order(spark, tmp_path):
    out = str(tmp_path / "shards")
    packed = _packed(spark)
    write_training_shards(packed, out, order_cols=("doc_id",))
    for shard in range(4):
        rows = read_training_shard(spark, out, shard, order_cols=("doc_id",)).collect()
        keys = [(r.seq_id, r.doc_id) for r in rows]
        assert keys == sorted(keys), f"shard {shard} out of order: {keys[:6]}..."
        # shard membership preserved
        expect = {
            (r.seq_id, r.doc_id)
            for r in packed.filter(F.col("shard") == shard).collect()
        }
        assert set(keys) == expect


def test_rewrite_is_stable(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    packed = _packed(spark)
    write_training_shards(packed, a, order_cols=("doc_id",))
    write_training_shards(packed.repartition(13), b, order_cols=("doc_id",))
    for shard in range(4):
        ra = [
            tuple(r)
            for r in read_training_shard(spark, a, shard, order_cols=("doc_id",)).collect()
        ]
        rb = [
            tuple(r)
            for r in read_training_shard(spark, b, shard, order_cols=("doc_id",)).collect()
        ]
        assert ra == rb  # input partitioning must not change the output
