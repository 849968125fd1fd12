"""asof_join: known-answer checks vs hand-computed matches (backward as-of,
LEFT semantics, equal-timestamp inclusion, per-key isolation)."""

import datetime as dt

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.asof import (
    asof_join,
)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "lid long, user long, ts timestamp")
    right = spark.createDataFrame(right_rows, "user long, ts timestamp, rid long")
    out = asof_join(left, right, on="user", right_cols=("rid",))
    return {r["lid"]: r["rid_right"] for r in out.collect()}


def test_matches_latest_at_or_before(spark):
    got = _run(
        spark,
        [(1, 7, _ts(10)), (2, 7, _ts(30))],
        [(7, _ts(5), 100), (7, _ts(20), 200), (7, _ts(40), 300)],
    )
    assert got == {1: 100, 2: 200}


def test_no_prior_right_row_yields_null(spark):
    got = _run(spark, [(1, 7, _ts(3))], [(7, _ts(5), 100)])
    assert got == {1: None}


def test_equal_timestamp_is_included(spark):
    got = _run(spark, [(1, 7, _ts(5))], [(7, _ts(5), 100)])
    assert got == {1: 100}


def test_keys_do_not_leak(spark):
    got = _run(
        spark,
        [(1, 7, _ts(10)), (2, 8, _ts(10))],
        [(7, _ts(5), 100), (8, _ts(9), 200)],
    )
    assert got == {1: 100, 2: 200}


def test_all_left_rows_survive(spark):
    left = [(i, 7, _ts(i)) for i in range(1, 8)]
    got = _run(spark, left, [(7, _ts(4), 100)])
    assert len(got) == 7
    assert got[3] is None and got[4] == 100 and got[7] == 100


def test_default_right_cols_excludes_key_and_time(spark):
    # default payload must not duplicate the time column in the struct
    left = spark.createDataFrame([(1, 7, _ts(10))], "lid long, user long, ts timestamp")
    right = spark.createDataFrame([(7, _ts(5), 100)], "user long, ts timestamp, rid long")
    out = asof_join(left, right, on="user").collect()
    assert out[0]["rid_right"] == 100
    assert out[0]["ts_right"] == _ts(5)


def test_randomized_against_brute_force(spark):
    import random

    rng = random.Random(1234)
    left = [
        (i, rng.randrange(5), _ts(rng.randrange(60)))
        for i in range(200)
    ]
    # distinct (user, ts) on the right so the match is unambiguous
    right_keys = {(rng.randrange(5), rng.randrange(60)) for _ in range(120)}
    right = [(u, _ts(s), 1000 + 60 * u + s) for (u, s) in right_keys]

    def brute(lid, user, ts):
        cands = [(rts, rid) for (u, rts, rid) in right if u == user and rts <= ts]
        return max(cands)[1] if cands else None

    want = {lid: brute(lid, u, ts) for (lid, u, ts) in left}
    got = _run(spark, left, right)
    assert got == want


def test_reserved_and_colliding_names_fail_loudly(spark):
    import pytest

    left = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1, 0, 5), 1)], "user string, ts timestamp, _side int"
    )
    right = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1, 0, 0), 7)], "user string, ts timestamp, rid int"
    )
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(left, right, on="user", right_cols=("rid",))

    # suffixed output name colliding with an existing left column
    left2 = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1, 0, 5), 9)], "user string, ts timestamp, rid_right int"
    )
    with pytest.raises(ValueError, match="collide with left"):
        asof_join(left2, right, on="user", right_cols=("rid",))


def test_asof_tolerance_nulls_stale_matches(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        asof_join,
    )
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 100.0), (1, 500.0), (2, 50.0)], "k long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 90.0, "a"), (1, 120.0, "b")], "k long, ts double, tag string"
    )
    out = {
        (r.k, r.ts): r.tag_right
        for r in asof_join(
            left, right, on="k", tolerance_seconds=60.0
        ).collect()
    }
    assert out[(1, 100.0)] == "a"  # 10s old: inside tolerance
    assert out[(1, 500.0)] is None  # latest match 'b' is 380s stale -> nulled
    assert out[(2, 50.0)] is None  # no right row at all


def test_asof_tolerance_zero_keeps_simultaneous(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        asof_join,
    )

    left = spark.createDataFrame([(1, 100.0)], "k long, ts double")
    right = spark.createDataFrame([(1, 100.0, "x")], "k long, ts double, tag string")
    row = asof_join(left, right, on="k", tolerance_seconds=0.0).first()
    assert row.tag_right == "x"  # >= semantics: age 0 passes tolerance 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, on="k", tolerance_seconds=-1.0)


def test_asof_tolerance_matches_reference_semantics_on_events(spark, sf_dir):
    """Tolerance == a windowed attribution: every purchase attributed only
    to a click at most 30min earlier — cross-checked against the plain
    as-of join filtered the naive way."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        asof_join,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    tol = asof_join(
        buys, clicks, on="user_id", tolerance_seconds=1800.0
    ).collect()
    plain = asof_join(buys, clicks, on="user_id").collect()
    naive = {}
    for r in plain:
        key = (r.user_id, r.ts)
        if r.ts_right is not None and (r.ts - r.ts_right).total_seconds() <= 1800:
            naive[key] = r.click_id_right
        else:
            naive[key] = None
    got = {(r.user_id, r.ts): r.click_id_right for r in tol}
    assert got == naive


def test_null_right_time_and_null_key_never_match(spark):
    """A right row with a NULL timestamp sorted FIRST in the window and was
    carried by last(ignorenulls=True) into every left row with no real
    preceding match; NULL join keys must never match (SQL semantics) even
    though partitionBy groups them."""
    left = spark.createDataFrame(
        [(1, 7, _ts(0)), (2, None, _ts(5))], "lid long, user long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, None, 99), (7, _ts(10), 5), (None, _ts(1), 42)],
        "user long, ts timestamp, rid long",
    )
    out = {r["lid"]: r["rid_right"] for r in asof_join(left, right, on="user").collect()}
    # lid=1 at t=0 precedes the only real right row (t=10) -> NULL, never 99
    # lid=2 has a NULL key -> never matches the NULL-key right row (42)
    assert out == {1: None, 2: None}
