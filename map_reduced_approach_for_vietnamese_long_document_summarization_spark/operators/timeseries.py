"""Time-series regularization: per-key resampling with forward fill.

Event streams are irregular; model features, joins against other regular
series, and window statistics want a fixed-step grid with the last
observation carried forward (the classic gap-fill). The as-of join
(`operators/asof.py`) answers "latest value at these query times"; this
materializes the full regular grid per key.

Scale design: one map-side-combinable aggregate to the (key, bucket) grain,
one tiny per-key span aggregate, a `sequence()` explode bounded by each
key's calendar span (never data volume — a key with a billion events in one
day still yields 24 hourly rows), and one per-key ordered window for the
fill. Everything shuffles by key exactly once past the bucket aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNITS = {"hour": "1 hour", "minute": "1 minute", "day": "1 day"}


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """Per-key fixed-step grid with forward-filled values.

    Returns ``(key, bucket, value, is_observed)``: one row per ``unit``
    bucket from each key's first to last observation. ``value`` is the
    bucket's last observation (arg-max by ``order_col`` — a unique id, so
    the pick is deterministic even under timestamp ties) carried forward
    across empty buckets; the first bucket always has an observation by
    construction, so no NULLs survive. ``is_observed`` marks real buckets.

    Rows with a NULL timestamp or NULL value are treated as missing
    observations and excluded up front (a NULL value cannot be "observed"
    and a NULL timestamp has no bucket). A NULL key is a real series of
    its own (the join back is null-safe).
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    step = F.expr(f"interval {_UNITS[unit]}")
    k, t, v = F.col(key_col), F.col(ts_col), F.col(value_col)
    events = events.filter(t.isNotNull() & v.isNotNull())
    bucketed = events.groupBy(
        k.alias("key"), F.date_trunc(unit, t).alias("bucket")
    ).agg(F.max_by(v, F.col(order_col)).alias("_v"))
    # spans derive from the bucketed frame (date_trunc is monotonic, so
    # min/max bucket == truncated min/max ts): Spark's ReuseExchange then
    # serves both branches from ONE scan + one key-wise shuffle instead of
    # re-aggregating the raw events a second time
    spans = bucketed.groupBy("key").agg(
        F.min("bucket").alias("_h0"), F.max("bucket").alias("_h1")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("_h0", "_h1", step)).alias("bucket")
    )
    joined = grid.alias("g").join(
        bucketed.alias("b"),
        F.col("g.key").eqNullSafe(F.col("b.key"))
        & (F.col("g.bucket") == F.col("b.bucket")),
        "left",
    ).select(F.col("g.key").alias("key"), F.col("g.bucket").alias("bucket"), "_v")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        F.last("_v", ignorenulls=True).over(w).alias(value_col),
        F.col("_v").isNotNull().alias("is_observed"),
    )


__all__ = ["resample_ffill"]
