"""Bucketed interval (range) join — points against containing intervals.

A point-in-interval join (``start <= t AND t < end``) has no equi key, so
Spark's planner falls back to BroadcastNestedLoopJoin — O(|points| x
|intervals|) compared predicates, a non-starter once the interval side
outgrows a broadcast. The standard fix (Databricks' range-join hints, the
interval-tree joins in genomics engines) is BUCKETIZATION, expressed here
in plain DataFrame ops:

* pick a bucket width ``w`` (seconds);
* each interval explodes into the buckets it overlaps (``sequence(floor(
  start/w), floor(end/w))`` — map-side, no shuffle of the interval table
  beyond the join's own);
* each point computes its single bucket ``floor(t/w)``;
* a hash equi-join on (optional key,) bucket meets every qualifying pair
  EXACTLY once (the point lives in one bucket; the interval covers it),
  then the exact range predicate filters bucket-mates that don't overlap.

Shuffle is one hash exchange per side keyed by bucket — the same cost
class as any equi-join. ``w`` is the dial: interval replication is
``1 + len/w`` rows, per-bucket pair work grows with ``w``; set it near the
median interval length. No reference counterpart (the reference has no
time-series ops) — north-star analytics surface, same family as
``asof_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_seconds: int,
    point_time: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    on: str | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it
    (``start <= t < end``; half-open, the window-semantics standard), with
    an optional equality key ``on`` (e.g. user_id). All point and interval
    payload columns ride through; clashing names must be renamed upstream.

    Timestamps may be TIMESTAMP or numeric; bucket arithmetic runs on
    ``unix_timestamp`` seconds."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    clash = (set(points.columns) & set(intervals.columns)) - ({on} if on else set())
    if clash:
        raise ValueError(f"rename clashing payload columns first: {sorted(clash)}")
    # "_b" is the internal bucket column: withColumn would silently replace
    # (then drop) a payload column of that name on either side
    reserved = {"_b"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError("interval_join reserves column name '_b'; rename it first")

    def secs(df, c):
        # dtype-aware, same rule as asof_join: TIMESTAMP goes through the
        # epoch-seconds cast; numeric axes are used in their own units
        # WITHOUT a timestamp round-trip — CAST(bigint AS TIMESTAMP)
        # multiplies by 1e6 internally, so an epoch-microseconds axis
        # (~1.7e15) would overflow long and wrap (non-ANSI), silently
        # corrupting bucket ids on both sides of the join
        dtype = dict(df.dtypes)[c]
        if dtype.startswith("timestamp") or dtype == "date":
            # DATE has no direct double cast — route through timestamp
            # (midnight UTC) like the timestamp axes
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    w = F.lit(float(bucket_seconds))
    p = points.withColumn("_b", F.floor(secs(points, point_time) / w))
    # half-open interval: the end bucket is floor((end - epsilon)/w); using
    # floor(end/w) costs at most one extra (filtered) bucket copy and keeps
    # the expression exact for all types
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(secs(intervals, start) / w),
                F.floor(secs(intervals, end) / w),
            )
        ),
    )
    keys = ["_b"] if on is None else [on, "_b"]
    joined = p.join(iv, keys).filter(
        (F.col(start) <= F.col(point_time)) & (F.col(point_time) < F.col(end))
    )
    return joined.drop("_b")
