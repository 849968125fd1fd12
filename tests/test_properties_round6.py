"""Round-6 property tests: the bucketization lemma shared by the batch
interval join (operators/interval.py) and its streaming twin
(streaming/events.py::interval_join_stream).

Both operators rest on the same claim: bucketing a point into
floor(t/w) and exploding an interval into [floor(s/w) .. floor(e/w)]
meets every truly-overlapping (point, interval) pair EXACTLY once in the
hash equi-join (the point occupies one bucket; the interval's bucket
range covers it), after which the exact half-open predicate
``s <= t < e`` discards bucket-mates that don't overlap. If the lemma
ever failed, both joins would silently DROP matching pairs — the
worst failure mode, invisible to a plan audit.
"""

import math

from hypothesis import given, strategies as st


def _point_bucket(t: float, w: float) -> int:
    return math.floor(t / w)


def _interval_buckets(s: float, e: float, w: float) -> range:
    return range(math.floor(s / w), math.floor(e / w) + 1)


# seconds-scale magnitudes, including negatives (pre-epoch timestamps) and
# sub-second fractions; w bounded away from 0 like the operator requires
_ts = st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, width=64)
_w = st.floats(min_value=1e-3, max_value=1e6, allow_nan=False, width=64)


@given(t=_ts, s=_ts, length=st.floats(min_value=0, max_value=1e6), w=_w)
def test_overlapping_pair_is_always_met(t, s, length, w):
    """s <= t < e  =>  the point's bucket lies in the interval's range."""
    e = s + length
    if not (s <= t < e):
        return
    assert _point_bucket(t, w) in _interval_buckets(s, e, w)


@given(t=_ts, s=_ts, length=st.floats(min_value=0, max_value=1e6), w=_w)
def test_pair_met_at_most_once(t, s, length, w):
    """The equi-join meets a pair once per shared bucket; the point has
    exactly ONE bucket, so no overlapping pair can ever be duplicated —
    the exactly-once half of the lemma is structural, pinned here against
    a future 'explode the point too' rewrite."""
    e = s + length
    shared = [b for b in (_point_bucket(t, w),) if b in _interval_buckets(s, e, w)]
    assert len(shared) <= 1


@given(s=_ts, length=st.floats(min_value=0, max_value=1e6), w=_w)
def test_end_boundary_is_exclusive(s, length, w):
    """t == e must NOT match (half-open window-semantics standard), even
    though floor(e/w) IS in the interval's bucket range — the bucket
    meeting alone is not a match; the exact predicate decides. This is the
    boundary a closed-interval rewrite would get wrong."""
    e = s + length
    # the bucket range may well contain e's bucket (by construction it does)
    assert _point_bucket(e, w) in _interval_buckets(s, e, w)
    # ... but the exact half-open predicate rejects it
    assert not (s <= e < e)
