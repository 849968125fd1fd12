"""Sequence packing: group documents into fixed-token training sequences.

LLM pre-training consumes fixed-length token windows; feeding one short doc
per window wastes most of it, so pipelines *pack* documents into bins of at
most ``max_tokens``. This operator reuses the collapse family's running-sum
bucketing (``operators/collapse.py:bucket_running_sum`` — the same greedy
start-offset formula the reference's ``split_list_of_docs`` uses for chunk
groups, MR:141-160) but at corpus granularity.

Scale design: a single global packing order would funnel 100 TB through one
window partition, so documents are sharded first (deterministic ``id %
n_shards``) and each shard packs independently — bins are (shard, seq_id)
pairs, the window runs per shard, and shard count scales with the cluster.
Packing quality is unaffected (any shard-local greedy fill achieves the same
fill ratio in expectation); determinism is exact: the bin of a document is a
pure function of (id, tokens of lower-id docs in its shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .collapse import bucket_running_sum


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 64,
    shard_col: str = "shard",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign each document a (``shard_col``, ``seq_col``) packing bin.

    Bins are filled greedily in ``id_col`` order by starting token offset:
    a document opens a new bin when the shard's running token sum crosses a
    ``max_tokens`` boundary. Oversized single documents keep their own bin
    (they must be chunked upstream; packing never splits). Output keeps all
    input columns plus the two bin columns.
    """
    sharded = docs.withColumn(shard_col, (F.col(id_col) % n_shards).cast("int"))
    return bucket_running_sum(
        sharded,
        max_tokens,
        key_cols=(shard_col,),
        order_col=id_col,
        tokens_col=tokens_col,
        group_col=seq_col,
    )


def packing_stats(
    packed: DataFrame,
    max_tokens: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "shard",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Per-bin fill statistics: docs per bin, token sum, fill fraction —
    the monitoring rollup a packing job emits (wasted-capacity tracking)."""
    return packed.groupBy(shard_col, seq_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("sum_tokens"),
        F.round(F.sum(tokens_col) / F.lit(float(max_tokens)), 6).alias("fill_frac"),
    )
