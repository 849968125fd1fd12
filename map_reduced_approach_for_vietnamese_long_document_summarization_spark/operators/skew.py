"""Skew-mitigation operators (SURVEY §7 hard-part 3: 54k-token docs with 4x
spread; at 100 TB a handful of hot keys can stall a whole stage).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in session defaults); these
helpers cover the two places AQE can't: skewed *aggregations* (two-phase
salted pre-aggregation) and skewed joins against a small-but-not-broadcastable
side (salt-replicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys: shuffle on (key, salt) first so a
    hot key spreads over ``salt`` reducers, then merge partials on the key.

    ``aggs`` are (partial_agg, merge_agg, name) triples, e.g.
    ``(F.count(F.lit(1)), F.sum, "n")`` or ``(F.sum("x"), F.sum, "total")``.
    Only algebraic aggregates (sum/count/min/max) decompose this way.

    The salt is a *deterministic* hash of the full row — never ``rand()``:
    task retries recompute identical salts, so a shuffle-fetch failure can't
    split one row's contributions across salt replicas (rand() is
    order-dependent and breaks exactly-once semantics under recomputation).
    Caveat: byte-identical duplicate rows share a salt and stay co-located —
    dedup such rows (or pre-aggregate a count) before salting if exact
    duplicates are themselves the hot key.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt)).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[a.alias(f"_p_{name}") for a, _, name in aggs]
    )
    return partial.groupBy(*key_cols).agg(
        *[merge(f"_p_{name}").alias(name) for _, merge, name in aggs]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the (big, skewed) left side deterministically
    (full-row hash, retry-safe — see salted_agg) and replicate the right side
    across all salt values — each hot key's rows spread over ``salt`` tasks
    instead of one straggler."""
    l = left.withColumn("_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, [key, "_salt"]).drop("_salt")
