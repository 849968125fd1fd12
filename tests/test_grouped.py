"""grouped_apply_sorted: batched per-key apply (operators/grouped.py).

Pins the contract that matters: identical results to
``groupBy(key).applyInPandas`` with an in-function sort, including when a
key's rows span Arrow batch boundaries (forced via a tiny
``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.grouped import (
    grouped_apply_sorted,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("joined", T.StringType(), True),
        T.StructField("n", T.IntegerType(), False),
    ]
)


def _concat_fn(cols):
    ti, oi = cols.index("t"), cols.index("o")

    def fn(key, rows):
        return [(key[0], "|".join(r[ti] for r in rows), len(rows))]

    return fn


def _make(spark, n_keys=50, rows_per_key=7):
    data = [
        (k, i, f"k{k}r{i}")
        for k in range(n_keys)
        for i in range(rows_per_key)
    ]
    # scrambled input order: the operator must restore o-order per key
    data = sorted(data, key=lambda r: (r[1] * 31 + r[0] * 7) % 97)
    return spark.createDataFrame(data, "k long, o int, t string")


def _expected(df):
    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o")
        return pd.DataFrame(
            {"k": [pdf["k"].iloc[0]], "joined": ["|".join(pdf["t"])], "n": [len(pdf)]}
        )

    return {
        (r.k, r.joined, r.n)
        for r in df.groupBy("k").applyInPandas(per_group, SCHEMA).collect()
    }


def test_matches_apply_in_pandas(spark):
    df = _make(spark)
    out = grouped_apply_sorted(df, ("k",), "o", _concat_fn(df.columns), SCHEMA)
    assert {(r.k, r.joined, r.n) for r in out.collect()} == _expected(df)


def test_groups_span_arrow_batches(spark):
    # 3-row Arrow batches vs 7-row groups: every group crosses a boundary
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        df = _make(spark, n_keys=20, rows_per_key=7)
        out = grouped_apply_sorted(df, ("k",), "o", _concat_fn(df.columns), SCHEMA)
        got = {(r.k, r.joined, r.n) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == _expected(df)
    assert all(n == 7 for _, _, n in got)


def test_empty_input(spark):
    df = spark.createDataFrame([], "k long, o int, t string")
    out = grouped_apply_sorted(df, ("k",), "o", _concat_fn(df.columns), SCHEMA)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "joined", "n"]


def test_single_group_and_fanout(spark):
    df = spark.createDataFrame([(1, 2, "b"), (1, 1, "a"), (1, 3, "c")], "k long, o int, t string")
    ti = df.columns.index("t")

    def explode_fn(key, rows):
        # 1-to-many output: one row per input row plus a total row
        out = [(key[0], r[ti], 1) for r in rows]
        out.append((key[0], "|".join(r[ti] for r in rows), len(rows)))
        return out

    got = {(r.k, r.joined, r.n) for r in grouped_apply_sorted(df, ("k",), "o", explode_fn, SCHEMA).collect()}
    assert got == {(1, "a", 1), (1, "b", 1), (1, "c", 1), (1, "a|b|c", 3)}


def test_single_exchange_in_plan(spark):
    # the whole point vs groupBy.applyInPandas: same ONE shuffle on the key,
    # no extra exchange introduced by the partition sort or the mapInPandas
    df = _make(spark)
    out = grouped_apply_sorted(df, ("k",), "o", _concat_fn(df.columns), SCHEMA)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_multi_column_key(spark):
    df = spark.createDataFrame(
        [(1, "x", 1, "a"), (1, "x", 2, "b"), (1, "y", 1, "c"), (2, "x", 1, "d")],
        "k1 long, k2 string, o int, t string",
    )
    schema = T.StructType(
        [
            T.StructField("k1", T.LongType(), False),
            T.StructField("k2", T.StringType(), False),
            T.StructField("joined", T.StringType(), True),
        ]
    )
    ti = df.columns.index("t")

    def fn(key, rows):
        return [(key[0], key[1], "|".join(r[ti] for r in rows))]

    got = {(r.k1, r.k2, r.joined) for r in grouped_apply_sorted(df, ("k1", "k2"), "o", fn, schema).collect()}
    assert got == {(1, "x", "a|b"), (1, "y", "c"), (2, "x", "d")}


def test_property_random_groups_match_apply_in_pandas(spark):
    # randomized shapes: ragged group sizes, shuffled input order, duplicate
    # order values within a key (reduce-over-sorted semantics stay equal
    # because the fold below is order-insensitive within ties)
    import random

    rng = random.Random(20260813)
    data = []
    for k in range(rng.randint(1, 40)):
        for i in range(rng.randint(1, 12)):
            data.append((k, i, f"k{k}i{i}v{rng.randint(0, 9)}"))
    rng.shuffle(data)
    df = spark.createDataFrame(data, "k long, o int, t string")
    out = grouped_apply_sorted(df, ("k",), "o", _concat_fn(df.columns), SCHEMA)
    assert {(r.k, r.joined, r.n) for r in out.collect()} == _expected(df)


def test_null_numeric_key_is_one_group(spark):
    """pandas renders NULL numeric keys as NaN, and NaN != NaN fragmented
    the group into one fn() call per row; keys are normalized to None."""
    from pyspark.sql import types as T

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.grouped import (
        grouped_apply_sorted,
    )

    df = spark.createDataFrame(
        [(None, 1, "x"), (None, 2, "y"), (7, 1, "z")],
        "k long, o int, v string",
    )
    calls = []

    def fn(key, rows):
        calls.append(key)
        yield (key[0], "|".join(r[2] for r in rows))

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("joined", T.StringType())]
    )
    out = {r.k: r.joined for r in grouped_apply_sorted(df, ("k",), "o", fn, schema).collect()}
    assert out == {None: "x|y", 7: "z"}
