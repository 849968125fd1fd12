"""Streaming-state plateau (VERDICT r6 item 3): the stream-stream joins'
state stores must track the watermark horizon, not total ingest.

The full 20-batch soak lives in examples/soak_streaming_state.py (series
recorded in SCALE.md); this test runs the same protocol at 12 batches so
the suite itself pins the plateau property: after the horizon fills, the
late half of the steady-state series must not exceed the early half by
more than PLATEAU_TOL, and the final state must not exceed the
first-horizon peak — a state leak fails both."""

import importlib.util
import os
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "soak_streaming_state",
    os.path.join(_REPO, "examples", "soak_streaming_state.py"),
)
soak = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(soak)

BATCHES, ROWS = 12, 400


def test_stream_join_state_plateaus(spark, tmp_path):
    root = str(tmp_path / f"soak_{uuid.uuid4().hex[:8]}")
    os.makedirs(root)
    series = soak.run_joins(spark, root, BATCHES, ROWS)
    assert set(series) == {"correlate_event_pairs", "interval_join_stream"}
    for name, s in series.items():
        # one progress row per micro-batch (plus at most one drain batch)
        assert BATCHES <= len(s) <= BATCHES + 1, (name, s)
        errs = soak.check_plateau(name, s)
        assert not errs, errs
        # the plateau is real eviction, not an empty join: state must have
        # both grown past one batch's rows and stopped at the horizon
        assert max(s) > ROWS, (name, s)
        assert max(s) < ROWS * (soak.HORIZON + 3), (name, s)


def test_summarize_churn_state_evicts(spark, tmp_path):
    """Doc-churn leg of the soak: fresh doc ids every micro-batch (one-pass
    ingestion). NoTimeout per-doc state tracks TOTAL docs seen by
    construction; the event-time idle eviction must hold state near the
    in-flight window instead."""
    root = str(tmp_path / f"churn_{uuid.uuid4().hex[:8]}")
    os.makedirs(root)
    docs = 40
    evict = soak.run_summarize_churn(spark, root, BATCHES, docs, idle_timeout_ms=900_000)
    nolimit = soak.run_summarize_churn(spark, root, BATCHES, docs, idle_timeout_ms=None)
    errs = soak.check_churn_eviction(evict, nolimit)
    assert not errs, (errs, evict, nolimit)
    # NoTimeout holds one state row per doc ever seen — exactly total ingest
    assert nolimit[-1] == BATCHES * docs, nolimit
    # evicted leg: 15-min idle / 10-min steps / 10-min watermark delay keeps
    # a doc ~3 batches past its last chunk (+1 batch of eviction lag)
    assert max(evict) <= 4 * docs, evict
