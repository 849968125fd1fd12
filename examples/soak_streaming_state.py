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

    python examples/soak_streaming_state.py [--batches 20] [--rows 2000] [--rocksdb]

Beyond the joins, a doc-churn leg drives the per-doc stateful operator
(``incremental_summarize_stream``) with FRESH doc ids every batch — the
one-pass ingestion shape — twice: NoTimeout (state = total docs seen, the
100 TB failure mode, kept as the measured counterfactual) and with
event-time idle eviction (state = in-flight window only). ``--rocksdb``
reruns everything on RocksDBStateStoreProvider, the production provider
once state outgrows executor heap; the series must reproduce exactly.

Exits non-zero if either join's state grows past the plateau bounds or
the churn leg's eviction fails to decouple state from ingest.
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
# watermark: 30 min horizon / 10 min step = 3 batches, +1 because a row
# ages out only when the watermark passes it STRICTLY (batch-k rows need
# max-event-time ≥ ts+40min at 10-min steps), +1 because the operative
# watermark is computed from the PREVIOUS batch's data — so batch-1 rows
# evict in batch 6, and state climbs for exactly 5 batches (both joins
# show the same fill; the interval side's bucket-explode only scales the
# plateau HEIGHT ~9%, not its length)
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


def _ensure_progress_capacity(spark, batches: int) -> None:
    """recentProgress keeps only the last numRecentProgressUpdates entries
    (default 100) — a longer soak would silently drop the watermark-fill
    head of the series and check_plateau would judge the wrong window."""
    need = max(100, 2 * batches + 10)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", str(need))


def _await_or_fail(q, name: str, timeout_s: int = 600) -> None:
    """availableNow replays must COMPLETE before the series is read — a
    partial read would measure a moving target and overlap the next leg."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"{name}: availableNow replay still running after {timeout_s}s — "
            "series would be partial; rerun on a quieter box or raise the timeout"
        )


def run_joins(spark, root: str, batches: int, rows: int) -> dict[str, list[int]]:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        correlate_event_pairs,
        interval_join_stream,
    )

    _ensure_progress_capacity(spark, batches)
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
    _await_or_fail(q, "correlate_event_pairs")
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
    _await_or_fail(q, "interval_join_stream")
    series["interval_join_stream"] = state_series(q)
    return series


def run_summarize_churn(
    spark, root: str, batches: int, docs_per_batch: int, idle_timeout_ms: int | None
) -> list[int]:
    """Doc-churn soak of ``incremental_summarize_stream``: every micro-batch
    carries chunks for a FRESH set of doc ids (the one-pass ingestion shape —
    each doc streams through once, then never again). Per-doc state under
    NoTimeout therefore grows linearly with total docs seen; with
    ``idle_timeout_ms`` the event-time idle eviction must hold it near the
    in-flight set. Same ordered-mtime ``availableNow`` replay protocol as the
    joins — eviction rides the data clock, so no wall-clock sleeps."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        incremental_summarize_stream,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )

    _ensure_progress_capacity(spark, batches)
    tag = "evict" if idle_timeout_ms is not None else "nolimit"
    d = os.path.join(root, f"chunks_{tag}")
    os.makedirs(d)
    now = time.time()
    for b in range(batches):
        t0 = BASE + pd.Timedelta(minutes=STEP_MIN * b)
        path = os.path.join(d, f"c{b:03d}.parquet")
        pd.DataFrame(
            {
                "doc_id": [b * docs_per_batch + i for i in range(docs_per_batch)],
                "chunk_idx": [0] * docs_per_batch,
                "chunk": [f"doc {b}-{i} body text" for i in range(docs_per_batch)],
                "ts": [t0] * docs_per_batch,
            }
        ).to_parquet(path, coerce_timestamps="us")
        os.utime(path, (now - batches + b, now - batches + b))
    stream = (
        spark.readStream.schema("doc_id long, chunk_idx long, chunk string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    # 15-min idle window under 10-min batch steps and a 10-min watermark
    # delay: a doc's state survives ~3 batches after its last chunk
    out = incremental_summarize_stream(
        stream,
        MockSummarizer(8),
        idle_timeout_ms=idle_timeout_ms,
        watermark="10 minutes",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(root, f"ckpt_sum_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    _await_or_fail(q, f"incremental_summarize[{tag}]")
    return state_series(q)


def check_churn_eviction(evict: list[int], nolimit: list[int]) -> list[str]:
    """The eviction leg must decouple state from total docs seen: its final
    state stays a small fraction of the NoTimeout leg's (which tracks total
    ingest by construction), and its late half must not keep growing."""
    errs = []
    if not evict or not nolimit:
        return [
            "summarize churn: empty state series "
            f"(evict={len(evict)}, nolimit={len(nolimit)} entries) — the "
            "leg produced no state-operator progress rows"
        ]
    if nolimit[-1] < nolimit[0] * 2:
        errs.append("summarize churn: NoTimeout leg did not grow — soak is not exercising churn")
    if evict[-1] > nolimit[-1] * 0.5:
        errs.append(
            f"summarize churn: evicted final state {evict[-1]} is not well below "
            f"NoTimeout final {nolimit[-1]} — idle eviction is not keeping up"
        )
    steady = evict[len(evict) // 3:]
    half = len(steady) // 2
    e_mean = sum(steady[:half]) / max(half, 1)
    l_mean = sum(steady[half:]) / max(len(steady) - half, 1)
    if l_mean > e_mean * 1.5:
        errs.append(
            f"summarize churn: evicted-state late-half mean {l_mean:.0f} grows past "
            f"1.5 x early-half mean {e_mean:.0f}"
        )
    return errs


def check_plateau(name: str, s: list[int]) -> list[str]:
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
    ap.add_argument(
        "--rocksdb",
        action="store_true",
        help="run every leg on RocksDBStateStoreProvider (the production "
        "provider at 100 TB — state spills to local disk instead of "
        "living in executor heap); bounds must hold identically",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="vlds-stream-soak", shuffle_partitions=8)
    if args.rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    root = tempfile.mkdtemp(prefix=f"stream_soak_{uuid.uuid4().hex[:8]}_")
    try:
        series = run_joins(spark, root, args.batches, args.rows)
        churn_evict = run_summarize_churn(
            spark, root, args.batches, args.rows // 20, idle_timeout_ms=900_000
        )
        churn_nolimit = run_summarize_churn(
            spark, root, args.batches, args.rows // 20, idle_timeout_ms=None
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    errs = []
    for name, s in series.items():
        print(f"{name} numRowsTotal per batch ({len(s)} batches):")
        print("  " + " ".join(str(v) for v in s))
        errs += check_plateau(name, s)
    print(f"incremental_summarize NoTimeout numRowsTotal ({len(churn_nolimit)} batches):")
    print("  " + " ".join(str(v) for v in churn_nolimit))
    print(f"incremental_summarize idle_timeout=15min numRowsTotal ({len(churn_evict)} batches):")
    print("  " + " ".join(str(v) for v in churn_evict))
    errs += check_churn_eviction(churn_evict, churn_nolimit)
    if errs:
        for e in errs:
            print(f"FAIL {e}", file=sys.stderr)
        raise SystemExit(1)
    print("# plateau holds for both joins (state tracks the watermark horizon, "
          "not total ingest) and idle eviction decouples per-doc summarize "
          "state from total docs seen")


if __name__ == "__main__":
    main()
