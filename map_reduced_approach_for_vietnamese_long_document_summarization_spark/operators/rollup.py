"""ANSI-faithful ROLLUP/CUBE: restore the grand-total row on empty input.

Round-9 differential-fuzzer finding (examples/fuzz_differential.py, 4/200
seeded shapes, class ``rollup_empty_input``): Spark's ``GROUP BY ROLLUP /
CUBE / GROUPING SETS`` return **zero rows when the input relation is
empty**, while the SQL standard treats the ``()`` grouping set as a global
aggregate — which must yield exactly one row (``count(*)`` = 0, ``sum`` =
NULL) even over empty input. DuckDB and PostgreSQL comply; Spark does not
(its grouping-set expansion goes through a regular hash aggregate with
grouping keys, which emits nothing for zero input groups). Minimal repro:

    spark.sql("SELECT s, count(*) FROM t WHERE false GROUP BY ROLLUP(s)")
    -- Spark: 0 rows; DuckDB/Postgres: 1 row (NULL, 0)

These wrappers add the missing row declaratively — no driver-side
emptiness check, no ``.count()`` action: a guard aggregate over the same
input produces its one row exactly when the input is empty (a global
aggregate always yields one row; the ``count(*) = 0`` filter keeps it only
then), and a ``unionByName`` splices it in with NULL group keys. For
non-empty input the guard branch yields zero rows and the result is
byte-identical to the plain ``df.rollup()/cube()``.

Cost: one extra aggregation branch over the input (empty-ness cannot be
decided without looking). Callers who can prove the input non-empty should
use plain ``rollup``/``cube``; callers replaying ANSI oracles (or feeding
downstream consumers that assume the standard's one-row contract) use
these. The registry's ``returnflag_cube`` / ``lineitem_grouping_sets``
queries keep the plain form — their harness inputs are never empty and the
oracle agreement is pinned by the driver; the divergence class itself is
pinned in tests/test_round9_fixes.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GUARD = "_vlds_empty_guard_n"


def _with_empty_grand_total(
    df: DataFrame, grouped: DataFrame, group_cols: tuple[str, ...],
    aggs: tuple[Column, ...],
) -> DataFrame:
    guard = df.agg(F.count(F.lit(1)).alias(_GUARD), *aggs).where(
        F.col(_GUARD) == 0
    )
    agg_names = [c for c in grouped.columns if c not in group_cols]
    empty_row = guard.select(
        *[
            F.lit(None).cast(grouped.schema[c].dataType).alias(c)
            for c in group_cols
        ],
        *[F.col(c) for c in agg_names],
    )
    return grouped.unionByName(empty_row)


def ansi_rollup(df: DataFrame, group_cols: tuple[str, ...],
                *aggs: Column) -> DataFrame:
    """``df.rollup(*group_cols).agg(*aggs)`` plus the ANSI grand-total row
    Spark omits when ``df`` is empty. See module docstring."""
    grouped = df.rollup(*group_cols).agg(*aggs)
    return _with_empty_grand_total(df, grouped, tuple(group_cols), aggs)


def ansi_cube(df: DataFrame, group_cols: tuple[str, ...],
              *aggs: Column) -> DataFrame:
    """``df.cube(*group_cols).agg(*aggs)`` plus the ANSI grand-total row
    Spark omits when ``df`` is empty. See module docstring."""
    grouped = df.cube(*group_cols).agg(*aggs)
    return _with_empty_grand_total(df, grouped, tuple(group_cols), aggs)
