"""Streaming-state soak: prove the stream-stream join state PLATEAUS.

VERDICT r6 item 3: ``interval_join_stream`` and ``correlate_event_pairs``
have parity / late-drop / plan-shape tests, so their state is bounded *by
construction* (watermarks + the explicit time-range bound). This script
closes the designed-vs-measured gap — the streaming analog of the nightly
soak's O(batch) row: drive ~20 micro-batches of skewed events (hot keys,
same skew philosophy as the soak generator) with steadily advancing event
time, record ``stateOperators[].numRowsTotal`` after every micro-batch,
and assert the series flattens once watermarks become operative instead
of growing with total ingest.

Protocol: all batch files are written up front with increasing mtimes and
``maxFilesPerTrigger=1`` (the late-drop test's protocol), so one
``availableNow`` run replays them as an ordered sequence of micro-batches;
``query.recentProgress`` then carries one state snapshot per batch.

Plateau assertion, per join: split the steady-state region (after the
watermark horizon fills, batch > HORIZON) into an early and a late half —
the late half's mean must not exceed the early half's mean by more than
PLATEAU_TOL (state tracking ingest would grow ~2x across the halves), and
the final state must stay under the watermark-horizon bound
(rows retained only for event time within watermark + one-batch lag).

    python examples/soak_streaming_state.py [--batches 20] [--rows 2000]

Exits non-zero if either join's state grows past the plateau bounds.
Results recorded in SCALE.md ("Streaming-state soak").
"""

import argparse
import os
import shutil
import sys
import tempfile
import time
import uuid

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark

BASE = pd.Timestamp("2024-01-01 00:00:00")
STEP_MIN = 10        # event-time advance per micro-batch
WATERMARK = "30 minutes"
# rows stay in state while their event time is above the operative
# watermark: 30 min horizon / 10 min step = 3 batches, +1 batch watermark
# lag, +1 slack for the bucket-explode duplication on the interval side
HORIZON = 5
PLATEAU_TOL = 1.25   # late-half mean vs early-half mean of steady state


def _hot_user(i: int) -> int:
    # 80% of rows on 3 hot keys — the viral-skew shape; state for a
    # stream-stream join is keyed by (key, bucket), so hot keys concentrate
    # state in few partitions while eviction must still hold globally
    return i % 3 if i % 5 != 4 else 1000 + i % 97


def write_event_batches(d: str, batches: int, rows: int) -> None:
    now = time.time()
    for b in range(batches):
        t0 = BASE + pd.Timedelta(minutes=STEP_MIN * b)
        n_click = rows // 2
        pd.DataFrame(
            {
                "event_id": [b * rows + i for i in range(rows)],
                "ts": [t0 + pd.Timedelta(seconds=(i * 540) // rows) for i in range(rows)],
                "user_id": [_hot_user(i) for i in range(rows)],
                "event_type": ["click"] * n_click + ["purchase"] * (rows - n_click),
                "value": [float(i) for i in range(rows)],
                "props": ["{}"] * rows,
            }
        ).to_parquet(os.path.join(d, f"b{b:03d}.parquet"), coerce_timestamps="us")
        os.utime(os.path.join(d, f"b{b:03d}.parquet"), (now - batches + b, now - batches + b))


def write_interval_batches(pdir: str, idir: str, batches: int, rows: int) -> None:
    now = time.time()
    n_iv = max(rows // 10, 1)
    for b in range(batches):
        t0 = BASE + pd.Timedelta(minutes=STEP_MIN * b)
        pd.DataFrame(
            {
                "click_id": [b * rows + i for i in range(rows)],
                "ts": [t0 + pd.Timedelta(seconds=(i * 540) // rows) for i in range(rows)],
                "user_id": [_hot_user(i) for i in range(rows)],
            }
        ).to_parquet(os.path.join(pdir, f"p{b:03d}.parquet"), coerce_timestamps="us")
        pd.DataFrame(
            {
                "purchase_id": [b * n_iv + i for i in range(n_iv)],
                "start_ts": [t0 + pd.Timedelta(seconds=(i * 300) // n_iv) for i in range(n_iv)],
                "end_ts": [t0 + pd.Timedelta(seconds=(i * 300) // n_iv + 300) for i in range(n_iv)],
                "user_id": [_hot_user(i) for i in range(n_iv)],
            }
        ).to_parquet(os.path.join(idir, f"i{b:03d}.parquet"), coerce_timestamps="us")
        for path in (os.path.join(pdir, f"p{b:03d}.parquet"), os.path.join(idir, f"i{b:03d}.parquet")):
            os.utime(path, (now - batches + b, now - batches + b))


def state_series(query) -> list[int]:
    """numRowsTotal of the (single) stateful operator, one entry per
    micro-batch, oldest first. Empty-trigger progress rows (no state
    operator) are skipped."""
    out = []
    for p in query.recentProgress:
        ops = p["stateOperators"] if isinstance(p, dict) else p.stateOperators
        if ops:
            row = ops[0]
            out.append(int(row["numRowsTotal"] if isinstance(row, dict) else row.numRowsTotal))
    return out


def run_joins(spark, root: str, batches: int, rows: int) -> dict[str, list[int]]:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        correlate_event_pairs,
        interval_join_stream,
    )

    series: dict[str, list[int]] = {}

    edir = os.path.join(root, "events")
    os.makedirs(edir)
    write_event_batches(edir, batches, rows)
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(edir)
    )
    out = correlate_event_pairs(
        events, within="10 minutes", watermark=WATERMARK
    )
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", os.path.join(root, "ckpt_corr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    series["correlate_event_pairs"] = state_series(q)

    pdir, idir = os.path.join(root, "points"), os.path.join(root, "intervals")
    os.makedirs(pdir)
    os.makedirs(idir)
    write_interval_batches(pdir, idir, batches, rows)
    points = (
        spark.readStream.schema("click_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
    )
    intervals = (
        spark.readStream.schema(
            "purchase_id long, start_ts timestamp, end_ts timestamp, user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(idir)
    )
    out = interval_join_stream(
        points,
        intervals,
        bucket_seconds=300,
        max_interval="10 minutes",
        on="user_id",
        point_watermark=WATERMARK,
        interval_watermark=WATERMARK,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", os.path.join(root, "ckpt_ivj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    series["interval_join_stream"] = state_series(q)
    return series


def check_plateau(name: str, s: list[int], batches: int) -> list[str]:
    errs = []
    steady = s[HORIZON:]
    if len(steady) < 6:
        return [f"{name}: only {len(steady)} steady-state batches — soak longer"]
    half = len(steady) // 2
    early, late = steady[:half], steady[half:]
    e_mean, l_mean = sum(early) / len(early), sum(late) / len(late)
    if l_mean > e_mean * PLATEAU_TOL:
        errs.append(
            f"{name}: state GROWS in steady state — late-half mean {l_mean:.0f} "
            f"> {PLATEAU_TOL} x early-half mean {e_mean:.0f}"
        )
    # growth-with-ingest check: by the last batch, total ingest is
    # batches/HORIZON times the watermark horizon — bounded state must not
    # track it (a leak tracks ingest, a plateau tracks the horizon)
    if s[-1] > max(s[:HORIZON + 2]) * PLATEAU_TOL:
        errs.append(
            f"{name}: final state {s[-1]} exceeds the first-horizon peak "
            f"{max(s[:HORIZON + 2])} x {PLATEAU_TOL}"
        )
    return errs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--rows", type=int, default=2000)
    args = ap.parse_args()

    spark = get_spark(app_name="vlds-stream-soak", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix=f"stream_soak_{uuid.uuid4().hex[:8]}_")
    try:
        series = run_joins(spark, root, args.batches, args.rows)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    errs = []
    for name, s in series.items():
        print(f"{name} numRowsTotal per batch ({len(s)} batches):")
        print("  " + " ".join(str(v) for v in s))
        errs += check_plateau(name, s, args.batches)
    if errs:
        for e in errs:
            print(f"FAIL {e}", file=sys.stderr)
        raise SystemExit(1)
    print("# plateau holds for both joins: state tracks the watermark "
          "horizon, not total ingest")


if __name__ == "__main__":
    main()
