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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .collapse import bucket_by_token_budget, bucket_running_sum


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 64,
    shard_col: str = "shard",
    seq_col: str = "seq_id",
    mode: str = "offset",
) -> DataFrame:
    """Assign each document a (``shard_col``, ``seq_col``) packing bin, in
    ``id_col`` order within each shard. Two bin rules:

    * ``mode="offset"`` (default): ``bin = floor(start_offset /
      max_tokens)`` — one window expression, SQL-replayable. Bins are
      CONTIGUOUS TOKEN RANGES, not hard caps: a document straddling a
      boundary overflows its bin by up to its own length minus one token,
      and an oversized document shares its bin with preceding documents
      unless its start happens to align. Right when the packed stream is
      re-cut into exact windows downstream (token-level concatenation),
      where only the offsets matter.
    * ``mode="greedy"``: a document opens a new bin whenever adding it
      would push the bin past ``max_tokens`` — bins NEVER exceed the budget
      unless a single document alone is oversized, and such a document is
      isolated in its own bin. Use this when bins feed fixed-context
      training windows directly. Runs as a JVM sequential fold over each
      shard's collected doc array: size ``n_shards`` so a shard holds at
      most ~1e5 docs (at 100 TB that means millions of shards — shard
      count is the scale knob, packing quality is shard-local either way).

    Neither mode splits documents (chunk oversized docs upstream). Output
    keeps the input columns plus the two bin columns (``mode="greedy"``
    reorders columns: key, id, payload, bin)."""
    id_type = dict(docs.dtypes)[id_col]
    if id_type in ("tinyint", "smallint", "int", "bigint"):
        shard = (F.col(id_col) % n_shards).cast("int")
    else:
        # non-integral ids (strings, decimals): `%` would coerce through
        # double and yield NULL for every row — the whole corpus funneled
        # into ONE null-shard window partition, the exact single-task
        # hazard sharding exists to prevent. Hash to a shard instead
        # (deterministic in the id, same contract).
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    sharded = docs.withColumn(shard_col, shard)
    if mode == "offset":
        return bucket_running_sum(
            sharded,
            max_tokens,
            key_cols=(shard_col,),
            order_col=id_col,
            tokens_col=tokens_col,
            group_col=seq_col,
        )
    if mode == "greedy":
        return bucket_by_token_budget(
            sharded,
            max_tokens,
            key_cols=(shard_col,),
            order_col=id_col,
            tokens_col=tokens_col,
            group_col=seq_col,
        )
    raise ValueError(f"mode must be 'offset' or 'greedy', got {mode!r}")


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
