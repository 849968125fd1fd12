"""As-of join: match each left row to the latest right row at or before it.

The canonical time-series lookup (trade→latest-quote, purchase→latest-click
attribution). Spark has no built-in as-of join; the naive formulations are
both scale hazards — a non-equi range join degenerates to a per-key nested
loop, and a "max timestamp then self-join back" pass scans twice. The
scalable formulation used here is the union+window trick:

1. tag right rows 0 and left rows 1, union them on the shared key,
2. one window per key ordered by (time, side): ``last(right_payload,
   ignorenulls=True)`` carries the most recent right row forward,
3. keep left rows — each now holds its as-of match (NULL when no right row
   precedes it, i.e. LEFT-join semantics).

Cost: ONE shuffle on the join key + a sort within partitions — the same
physics as any windowed aggregate, no matter how skewed the time axis. At
equal timestamps the right row sorts first, so "at or before" includes
simultaneous rows (DuckDB ``ASOF JOIN``'s ``>=`` semantics, which the
oracle in plans/training.py replays natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: tuple[str, ...] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """LEFT as-of join: every ``left`` row, plus the latest ``right`` row of
    the same ``on`` key with ``right_time <= left_time`` (NULLs if none).

    ``right_cols`` selects which right-side payload columns to carry
    (default: all except the key); each is emitted as ``<name><suffix>``.

    ``tolerance_seconds`` bounds the lookback (pandas ``merge_asof``'s
    ``tolerance``): a match older than ``left_time - tolerance`` is nulled
    out — an attribution window, "quote too stale to use", etc. Applied as
    a post-window predicate on the matched payload's own timestamp, so the
    plan (one shuffle + one sort) is unchanged. TIMESTAMP columns measure
    the tolerance in seconds; numeric time columns in their own units (no
    intermediate timestamp cast — casting an epoch-microseconds axis
    through TIMESTAMP would overflow to NULL and silently null every
    match)."""
    internal = {"_k", "_t", "_side", "_p", "_m"}
    clash = internal & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(internal)}; "
            f"rename left columns {sorted(clash)} first"
        )
    if right_cols is None:
        # right_time is always carried separately as the struct's first
        # field — including it again would duplicate the field name and make
        # the _m[...] extraction ambiguous
        right_cols = tuple(c for c in right.columns if c not in (on, right_time))
    else:
        # same ambiguity when the caller passes right_time (or a dup) in an
        # explicit right_cols: the payload struct would carry two fields of
        # one name and the _m[...] extraction dies with an opaque
        # AMBIGUOUS_REFERENCE — fail with the actionable error instead
        bad = [c for c in right_cols if c == right_time]
        if bad or len(set(right_cols)) != len(right_cols):
            raise ValueError(
                "asof_join right_cols must be unique and must not repeat "
                f"right_time={right_time!r} (it is always carried as the "
                f"first payload field); got right_cols={list(right_cols)}"
            )
    out_names = [f"{c}{suffix}" for c in (right_time, *right_cols)]
    dup_out = set(out_names) & set(left.columns)
    if dup_out:
        raise ValueError(
            f"asof_join output columns {sorted(dup_out)} collide with left "
            f"columns; pass a different suffix= or project the left side"
        )
    payload = F.struct(*[F.col(c).alias(c) for c in (right_time, *right_cols)])

    # drop right rows whose key or time is NULL BEFORE the union: a NULL
    # time sorts FIRST in the ascending window (its payload struct is
    # non-NULL), so last(_p, ignorenulls=True) would carry it into every
    # left row with no real preceding match — a spurious match with a NULL
    # matched timestamp; and NULL join keys must never match (SQL join
    # semantics), but partitionBy groups them together. Ties on
    # (key, right_time) are broken by whichever tied row the sort places
    # last — give the right side a unique tiebreaker upstream if tied
    # payloads differ.
    r = right.filter(F.col(on).isNotNull() & F.col(right_time).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    left_cols = left.columns
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c) for c in left_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r, allowMissingColumns=True).withColumn(
        "_m", F.last("_p", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        if tolerance_seconds < 0:
            raise ValueError(f"tolerance_seconds must be >= 0, got {tolerance_seconds}")
        # dtype-aware age: timestamp columns go through the timestamp cast
        # (epoch seconds; NTZ cannot cast straight to double), numeric
        # columns subtract in their native units WITHOUT a timestamp
        # round-trip (an epoch-microseconds axis would overflow to NULL)
        _t_dtype = dict(matched.dtypes)["_t"]
        if _t_dtype.startswith("timestamp") or _t_dtype == "date":
            age = (
                F.col("_t").cast("timestamp").cast("double")
                - F.col("_m")[right_time].cast("timestamp").cast("double")
            )
        else:
            age = F.col("_t").cast("double") - F.col("_m")[right_time].cast("double")
        matched = matched.withColumn(
            "_m", F.when(age <= F.lit(float(tolerance_seconds)), F.col("_m"))
        )
    out = matched.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_m")[c].alias(f"{c}{suffix}") for c in (right_time, *right_cols)],
    )
    return out
