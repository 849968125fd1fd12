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

    SMALL INPUTS ONLY: the unpartitioned ``row_number`` windows move each
    side through a single task (the global-sort trap) — right for J3's
    per-document chunk/summary lists, wrong for corpus-sized frames. At
    scale, join on an explicit key instead (the engine's other pairings
    all do)."""
    from pyspark.sql import Window

    right_order = right_order or left_order
    l = left.withColumn("_rn", F.row_number().over(Window.orderBy(left_order)))
    r = right.withColumn("_rn", F.row_number().over(Window.orderBy(right_order)))
    return l.join(r, "_rn", "inner").drop("_rn")


def skip_existing_bloom(
    docs: DataFrame,
    existing_keys: DataFrame,
    key: str = "doc_id",
    expected_items: int = 1_000_000,
    num_bits: int | None = None,
    n_hashes: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Scale path for ``skip_existing`` (F3): when the curated corpus's key
    set is too big to broadcast as rows (10^10 keys = hundreds of GB), a
    Bloom filter of it is still broadcast-able.

    Built in pure DataFrame ops (Spark's own ``bloom_filter_agg`` /
    ``might_contain`` expressions are internal-only — injected by the
    runtime-filter optimizer, not registered as SQL functions): the bit
    array is a ``(word, bits)`` table of 64-bit words — each existing key
    sets ``n_hashes`` positions ``xxhash64(salt_i, key) mod m``, folded
    per word with a map-side-combinable ``bit_or`` (one pass over the key
    set, no shuffle of keys; at most ``m/64`` output rows = ~2x the raw
    bloom bits as a broadcast table). Membership is ``n_hashes`` broadcast
    hash joins against that table — scan-speed, no shuffle of ``docs``.

    Bloom filters have NO false negatives, so a doc testing negative is
    *guaranteed* new and passes straight through. The ~fpp false-positive
    sliver (genuinely-new docs testing positive) is resolved by
    ``exact=True`` (default): only the maybe-existing docs — |existing| +
    fpp*|new| rows, not the whole batch — enter the exact anti-join, so
    the result EQUALS ``skip_existing``'s (hash-independent, which is why
    the SQL oracle needs no bloom replay) at a fraction of the join.
    ``exact=False`` skips the join and accepts losing ~fpp of new docs.
    Default sizing ``num_bits = 16 * expected_items`` gives fpp ~1% at
    ``n_hashes=3``."""
    internal = {"_maybe"} | {
        f"_{p}{i}" for i in range(n_hashes) for p in ("p", "w", "b")
    }
    reserved = internal & set(docs.columns)
    if reserved:
        raise ValueError(
            f"skip_existing_bloom reserves column names {sorted(reserved)}; "
            "rename them first"
        )
    if num_bits is None:
        num_bits = max(64, 16 * expected_items)
    m = (num_bits + 63) // 64 * 64  # whole 64-bit words

    docs_key_type = docs.schema[key].dataType

    def positions(df: DataFrame) -> list:
        # hash the key's STRING form AFTER casting to the docs column's
        # dtype: xxhash64 is type-sensitive (int 5 and bigint 5 hash
        # differently), and string forms diverge across numeric families
        # too (bigint 5 -> '5', double 5.0 -> '5.0'). The exact anti-join
        # coerces both sides to a common type before comparing, so the
        # bloom must hash under the SAME coercion or joinable keys hash
        # apart — existing docs would test "definitely new" and leak
        # through even in exact mode. Casting existing to docs' dtype makes
        # hashes agree exactly when the join would match (a lossy cast can
        # only create false POSITIVES, which the exact rescue resolves).
        k = F.col(key).cast(docs_key_type).cast("string")
        return [
            F.pmod(F.xxhash64(F.lit(i), k), F.lit(m)).alias(f"_p{i}")
            for i in range(n_hashes)
        ]

    pos = existing_keys.select(
        F.explode(F.array(*positions(existing_keys))).alias("_p")
    )
    words = pos.groupBy((F.col("_p") / 64).cast("long").alias("_w")).agg(
        # shiftleft/shiftright need expr(): the PySpark wrappers take only a
        # Python-int shift amount, not a Column
        F.bit_or(F.expr("shiftleft(1L, cast(_p % 64 as int))")).alias("_bits")
    )
    # each of the n_hashes membership joins broadcasts `words` under a
    # DIFFERENT alias, and ReuseExchange does not dedupe across them — the
    # full key-set scan+aggregate would run n_hashes times. persist() is
    # lazy (no job here); callers in long-lived sessions release via
    # dedup.unpersist_inputs(result). Below ~1M expected keys the one-shot
    # materialization costs more than the n_hashes-1 recomputes it saves
    # (round-7 probe: 1.55x at sf0.1), so the persist is gated on the
    # caller's sizing hint — at the 10^10-key scale this operator exists
    # for, expected_items is always far past the gate.
    persisted: list = []
    if expected_items >= 1_000_000:
        words = words.persist()
        persisted.append(words)

    flagged = docs.select(*docs.columns, *positions(docs))
    maybe = F.lit(True)
    for i in range(n_hashes):
        w = words.select(F.col("_w").alias(f"_w{i}"), F.col("_bits").alias(f"_b{i}"))
        flagged = flagged.join(
            F.broadcast(w),
            (F.col(f"_p{i}") / 64).cast("long") == F.col(f"_w{i}"),
            "left",
        )
        hit = (
            F.expr(
                f"shiftright(coalesce(_b{i}, 0L), cast(_p{i} % 64 as int)) & 1L"
            )
            == 1
        )
        maybe = maybe & hit
    flagged = flagged.withColumn("_maybe", maybe).drop(
        *[c for i in range(n_hashes) for c in (f"_p{i}", f"_w{i}", f"_b{i}")]
    )
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    if not exact:
        definitely_new._persisted_inputs = persisted  # unpersist hook
        return definitely_new
    rescued = (
        flagged.filter(F.col("_maybe"))
        .drop("_maybe")
        .join(existing_keys.select(key), key, "left_anti")
    )
    out = definitely_new.unionByName(rescued)
    out._persisted_inputs = persisted  # unpersist hook for long-lived sessions
    return out


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Snapshot diff of two corpus versions: (key, status) where status is
    ``added`` (key only in new), ``removed`` (only in old), ``changed``
    (both, different normalized-text fingerprint) or ``unchanged`` — the
    release-to-release audit every curated-corpus pipeline publishes next
    to its manifest (how much churn did this rebuild introduce, and where).

    One full outer join on the key with 16-byte fingerprints — the
    documents' text never shuffles (fingerprints computed scan-side), so
    the diff costs the same as any key join at 100 TB. When the pipeline
    already maintains a fingerprint sidecar (``examples/
    nightly_increment.py``), pass its column as ``fingerprint_col`` and
    hand in the sidecar frames — the diff then never touches text at all
    (O(keys), not O(corpus bytes))."""
    from ..functions.textstats import doc_fingerprint

    fp = (
        F.col(fingerprint_col)
        if fingerprint_col
        else doc_fingerprint(F.col(text_col))
    )
    # explicit presence markers: deciding presence from fingerprint
    # NULL-ness would misclassify NULL-text rows (their fingerprint is NULL
    # while the row exists) — a removed NULL-text doc would read "added"
    o = old.select(
        F.col(key),
        fp.alias("_fp_old"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key),
        fp.alias("_fp_new"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old").eqNullSafe(F.col("_fp_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(key, status.alias("status"))
