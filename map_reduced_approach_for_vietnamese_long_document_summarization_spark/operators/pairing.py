"""Doc/reference pairing joins (SURVEY §2.2 F1-F3, §2.3 J1-J3).

The reference pairs documents with gold summaries by filename-set
intersection (run_full_evaluation_pipeline.py:247-250) and skips docs whose
output already exists (ibid.:423-431). Spark-first: semi/anti joins — hash
joins that broadcast the small side, never a driver-side set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_docs_with_refs(
    docs: DataFrame, refs: DataFrame, key: str = "doc_id", broadcast_refs: bool = True
) -> DataFrame:
    """Inner equi-join doc <-> gold reference (J1/J2).

    References are small (one short summary per doc) — broadcast them so the
    100 TB document side never shuffles.
    """
    right = F.broadcast(refs) if broadcast_refs else refs
    return docs.join(right, key, "inner")


def anti_pairs(docs: DataFrame, refs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Docs with no reference — the 'warn + skip' report side (F2)."""
    return docs.join(F.broadcast(refs.select(key)), key, "left_anti")


def skip_existing(
    docs: DataFrame, existing_keys: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Incremental recompute (F3): drop docs whose output already exists.

    Anti-join against the sink's key set *before* the expensive UDF stage —
    the predicate-pushdown-like effect the reference gets from its
    skip-if-exists check (run_full_evaluation_pipeline.py:423-431).
    """
    return docs.join(F.broadcast(existing_keys.select(key)), key, "left_anti")


def positional_zip_join(
    left: DataFrame, right: DataFrame, left_order: str, right_order: str | None = None
) -> DataFrame:
    """Replace the reference's fragile ``zip(list_a, list_b)`` (J3,
    runners/run_summarization_ollama_mapreduce.py:284-288) with an explicit
    ``row_number``-over-sort equi-join — deterministic under partitioning.
    """
    from pyspark.sql import Window

    right_order = right_order or left_order
    l = left.withColumn("_rn", F.row_number().over(Window.orderBy(left_order)))
    r = right.withColumn("_rn", F.row_number().over(Window.orderBy(right_order)))
    return l.join(r, "_rn", "inner").drop("_rn")
