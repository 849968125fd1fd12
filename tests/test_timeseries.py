"""resample_ffill (operators/timeseries.py): grid bounds, forward fill,
deterministic in-bucket pick, unit validation. Oracle parity runs in
test_oracle_parity.py."""

from datetime import datetime

import pytest

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.timeseries import (
    resample_ffill,
)

SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _ev(spark):
    rows = [
        # user 1: events at 00:10, 00:40 (same hour), then a 2-hour gap to 03:05
        (1, datetime(2024, 1, 1, 0, 10), 1, 10.0),
        (2, datetime(2024, 1, 1, 0, 40), 1, 20.0),
        (3, datetime(2024, 1, 1, 3, 5), 1, 30.0),
        # user 2: a single event
        (4, datetime(2024, 1, 2, 12, 30), 2, 7.0),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_grid_and_forward_fill(spark):
    out = {
        (r.user_id, r.bucket): (r.value, r.is_observed)
        for r in resample_ffill(_ev(spark)).collect()
    }
    # user 1: hours 00..03 inclusive -> 4 buckets; user 2: 1 bucket
    assert len(out) == 5
    # in-bucket pick is the LAST observation (max event_id)
    assert out[(1, datetime(2024, 1, 1, 0, 0))] == (20.0, True)
    # empty hours carry the previous value, flagged unobserved
    assert out[(1, datetime(2024, 1, 1, 1, 0))] == (20.0, False)
    assert out[(1, datetime(2024, 1, 1, 2, 0))] == (20.0, False)
    assert out[(1, datetime(2024, 1, 1, 3, 0))] == (30.0, True)
    assert out[(2, datetime(2024, 1, 2, 12, 0))] == (7.0, True)


def test_no_nulls_ever(spark):
    out = resample_ffill(_ev(spark)).collect()
    assert all(r.value is not None for r in out)


def test_unit_validation(spark):
    with pytest.raises(ValueError):
        resample_ffill(_ev(spark), unit="fortnight")


def test_minute_unit(spark):
    out = resample_ffill(_ev(spark), unit="minute").collect()
    u1 = [r for r in out if r.user_id == 1]
    # 00:10 .. 03:05 inclusive = 176 minute buckets
    assert len(u1) == 176
    assert sum(r.is_observed for r in u1) == 3


def test_null_key_ts_value_handling(spark):
    from datetime import datetime as dt

    rows = [
        (1, dt(2024, 1, 1, 0, 5), None, 1.0),  # NULL key: its own series
        (2, dt(2024, 1, 1, 1, 5), None, 2.0),
        (3, None, 7, 9.0),  # NULL ts: excluded
        (4, dt(2024, 1, 1, 0, 30), 8, None),  # NULL value: missing obs
        (5, dt(2024, 1, 1, 2, 30), 8, 4.0),
    ]
    out = resample_ffill(spark.createDataFrame(rows, SCHEMA)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r)
    # NULL key forms a 2-bucket forward-filled series, no NULL values
    nk = sorted(by_key[None], key=lambda r: r.bucket)
    assert [r.value for r in nk] == [1.0, 2.0]
    assert all(r.value is not None for r in out)
    # key 7 (only a NULL-ts row) vanishes; key 8's span starts at its
    # first NON-NULL observation
    assert 7 not in by_key
    assert len(by_key[8]) == 1 and by_key[8][0].value == 4.0
