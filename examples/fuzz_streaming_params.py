"""Seeded parameter fuzz of the streaming surface vs its batch twins.

The streaming operators' batch-parity tests pin FIXED window specs
(10m tumbling, 10m/5m sliding, 30m session). But windowed stateful
aggregation is a parameter FAMILY — window length, slide, session gap,
grouping key, aggregate set — and the streaming execution path (stateful
agg operators, session merging, watermark bookkeeping) is physically
different from the batch hash aggregate even for one micro-batch. This
harness draws N seeded random configs, runs each through BOTH paths —
``availableNow`` file-source stream -> memory sink (complete mode) vs a
batch computation with the IDENTICAL ``window``/``session_window`` spec —
and diffs with the driver's normalization.

Complete mode over the single harness file means the watermark never
drops rows (first-batch watermark is epoch), so stream output must EQUAL
batch output exactly for every config; late-data/eviction semantics are
covered separately (tests/test_streaming.py watermark-advance test, the
r7 state soaks). What this fuzz adds is the parameter space: session-gap
merge chains, non-divisor slides, minute-grain windows, per-key vs
global grouping, multi-aggregate sets.

The ``disorder`` family (VERDICT r10 item 6) additionally randomizes the
ARRIVAL schedule: events are split into time-contiguous chunk files, a
seeded fraction of rows is shifted 1..max_shift chunks later (bounded
out-of-order arrival, each chunk one micro-batch via maxFilesPerTrigger),
and the append-mode windowed aggregate runs against a pure-Python replay
of the watermark protocol — per-batch watermark advance (max event time
minus delay, monotonic), late contributions dropped when every window has
closed, and only watermark-closed windows emitted. The replay IS the
batch twin's predicate, so the watermark-drop set is asserted, not just
the happy path.

Round 12 (VERDICT r11 item 4) extends disorder to the remaining stateful
families:

* ``disorder_session`` — same chunked schedule through a streaming
  ``session_window`` aggregate vs an exact replay of the session
  protocol, pinned by six targeted experiments against Spark 4.1
  (``simulate_session_disorder``): the late filter drops a row iff its
  initial session END (ts+gap) <= wm_eff[k-1] (one-batch lag, tie
  drops); merges are boundary-INCLUSIVE (an event exactly at a session's
  end extends it); eviction at the end of batch k emits sessions with
  end <= wm_eff[k] (tie evicts); and an evicted session never merges
  back — a kept straggler adjacent to one forms a NEW session, so
  OVERLAPPING emitted sessions are legal streaming output that the
  all-at-once batch twin would merge (the replay tracks eviction state
  to reproduce exactly this).
* ``disorder_interval`` — the chunked schedule through
  ``interval_join_stream`` (stream-stream join). An exact replay would
  re-implement the join-state eviction derivation, so the oracle is the
  sound SANDWICH Spark documents for watermarked stream-stream inner
  joins: every pair whose two rows were both on-time (watermark column
  strictly above the replayed global watermark — the min over both
  sides' max-minus-delay nodes — at their arrival batch) MUST be
  emitted, and every emitted pair MUST be in the batch twin's result
  (multiset compare, so duplicate emission also fails). Pairs involving
  a late row may legally go either way and are only counted.

    python examples/fuzz_streaming_params.py [--n 24] [--seed 7007]
                                             [--sf-dir /root/testdata/sf0.01]
                                             [--out fuzz_streaming_last.json]

Exit 1 on any config whose stream and batch outputs differ.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import random
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOWS_MIN = [1, 3, 5, 7, 10, 15, 30, 60, 90]
GAPS_MIN = [1, 2, 5, 10, 30, 120]
KEYS = [None, "event_type", "user_id"]
AGGS = ["count", "sum", "min_max", "count_sum"]
# interval-join family: interval length (minutes) x bucket width (seconds),
# deliberately spanning bucket >> interval and bucket << interval (the
# replication-factor extremes of the bucketization), both directions
IV_LEN_MIN = [1, 5, 10, 30, 60, 240]
IV_BUCKET_SEC = [60, 300, 900, 1800, 3600, 7200]
EVENT_TYPES = ["click", "view", "purchase"]


def _normalize_fn():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fuzz_differential.py")
    spec = importlib.util.spec_from_file_location("fuzz_differential", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._normalize


def gen_config(seed: int) -> dict:
    """Same seed -> same config, independent of draw order elsewhere."""
    rng = random.Random(seed)
    op = rng.choice(["tumbling", "sliding", "session", "interval", "disorder",
                     "disorder_session", "disorder_interval"])
    if op == "disorder":
        w = rng.choice([1, 3, 5, 10])
        return {
            "seed": seed, "op": op,
            "window": f"{w} minutes",
            # half the configs slide (non-divisor slides included via w//2)
            "slide": f"{max(1, w // 2)} minutes" if rng.random() < 0.5 else None,
            "key": rng.choice(KEYS),
            "agg": rng.choice(AGGS),
            "watermark": f"{rng.choice([5, 15, 60])} minutes",
            "n_batches": rng.choice([3, 5, 8]),
            "p_late": rng.choice([0.05, 0.2]),
            "max_shift": rng.choice([1, 2]),
        }
    if op == "disorder_session":
        return {
            "seed": seed, "op": op,
            "gap": f"{rng.choice([2, 5, 10, 30])} minutes",
            "key": rng.choice(KEYS[1:]),  # streaming sessions require a key
            "agg": rng.choice(AGGS),
            "watermark": f"{rng.choice([5, 15, 60])} minutes",
            "n_batches": rng.choice([3, 5, 8]),
            "p_late": rng.choice([0.05, 0.2]),
            "max_shift": rng.choice([1, 2]),
        }
    if op == "disorder_interval":
        pt, it = rng.sample(EVENT_TYPES, 2)
        return {
            "seed": seed, "op": op,
            "point_type": pt, "interval_type": it,
            # moderate bucket replication only (len/bucket <= 12): the
            # multi-batch state store pays per batch, unlike the one-shot
            # fixed-schedule interval family
            "len_min": rng.choice([5, 30, 60]),
            "bucket_sec": rng.choice([300, 1800, 3600]),
            "direction": rng.choice(["lookback", "lookahead"]),
            "point_watermark": f"{rng.choice([5, 15, 60])} minutes",
            "interval_watermark": f"{rng.choice([5, 15, 60])} minutes",
            "n_batches": rng.choice([3, 5]),
            "p_late": rng.choice([0.05, 0.2]),
            "max_shift": rng.choice([1, 2]),
        }
    if op == "interval":
        pt, it = rng.sample(EVENT_TYPES, 2)
        return {
            "seed": seed, "op": op,
            "point_type": pt, "interval_type": it,
            "len_min": rng.choice(IV_LEN_MIN),
            "bucket_sec": rng.choice(IV_BUCKET_SEC),
            # lookback: interval = the len_min before the anchor event;
            # lookahead: the len_min after it
            "direction": rng.choice(["lookback", "lookahead"]),
        }
    # session windows REQUIRE a grouping key in streaming: Spark raises
    # "Global aggregation with session window in streaming query is not
    # supported" (found by this harness's first smoke batch, seed 42001) —
    # a real engine constraint the batch path does NOT have, so the
    # generator constrains rather than classifies it
    key = rng.choice(KEYS[1:] if op == "session" else KEYS)
    cfg = {"seed": seed, "op": op, "key": key,
           "agg": rng.choice(AGGS),
           "watermark": rng.choice(["10 minutes", "30 minutes", "2 hours"])}
    if op == "session":
        cfg["gap"] = f"{rng.choice(GAPS_MIN)} minutes"
    else:
        w = rng.choice(WINDOWS_MIN)
        cfg["window"] = f"{w} minutes"
        if op == "sliding":
            # any slide <= window, deliberately including non-divisors
            cfg["slide"] = f"{rng.randint(1, w)} minutes"
    return cfg


def _aggs(cfg):
    from pyspark.sql import functions as F

    out = []
    if cfg["agg"] in ("count", "count_sum"):
        out.append(F.count(F.lit(1)).alias("n_events"))
    if cfg["agg"] in ("sum", "count_sum"):
        out.append(F.round(F.sum("value"), 6).alias("total_value"))
    if cfg["agg"] == "min_max":
        out.append(F.round(F.min("value"), 6).alias("min_value"))
        out.append(F.round(F.max("value"), 6).alias("max_value"))
    return out


def _windowed(df, cfg, streaming: bool):
    from pyspark.sql import functions as F

    if streaming:
        df = df.withWatermark("ts", cfg["watermark"])
    if cfg["op"] == "session":
        w = F.session_window("ts", cfg["gap"]).alias("w")
    elif cfg["op"] == "sliding":
        w = F.window("ts", cfg["window"], cfg["slide"]).alias("w")
    else:
        w = F.window("ts", cfg["window"]).alias("w")
    keys = [w] + ([cfg["key"]] if cfg["key"] else [])
    out = df.groupBy(*keys).agg(*_aggs(cfg))
    sel = [F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end")]
    if cfg["key"]:
        sel.append(F.col(cfg["key"]))
    sel += [c for c in out.columns if c != "w" and c != cfg.get("key")]
    return out.select(*sel)


def _interval_shapes(ev, cfg):
    """(points, intervals) for one interval config: points are rows of
    point_type; intervals anchor on interval_type rows and extend len_min
    back or forward. Same derivation for the stream and the batch side."""
    from pyspark.sql import functions as F

    points = ev.filter(F.col("event_type") == cfg["point_type"]).select(
        "user_id", F.col("event_id").alias("point_id"), "ts")
    anchors = ev.filter(F.col("event_type") == cfg["interval_type"])
    iv = F.expr(f"INTERVAL {cfg['len_min']} MINUTES")
    if cfg["direction"] == "lookback":
        intervals = anchors.select(
            "user_id", F.col("event_id").alias("interval_id"),
            (F.col("ts") - iv).alias("start_ts"), F.col("ts").alias("end_ts"))
    else:
        intervals = anchors.select(
            "user_id", F.col("event_id").alias("interval_id"),
            F.col("ts").alias("start_ts"), (F.col("ts") + iv).alias("end_ts"))
    return points, intervals


def _run_interval(spark, cfg, events_stream, batch_events, name, phase_box):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.interval import (
        interval_join,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        interval_join_stream,
    )

    s_pts, s_ivs = _interval_shapes(events_stream, cfg)
    out = interval_join_stream(
        s_pts, s_ivs, bucket_seconds=cfg["bucket_sec"],
        max_interval=f"{cfg['len_min']} minutes", on="user_id",
    ).select("user_id", "point_id", "interval_id")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    if not q.awaitTermination(180):
        # stop the query before raising: a leaked running query would keep
        # competing with every subsequent config (ADVICE r10)
        q.stop()
        raise TimeoutError("interval stream did not finish in 180s")
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    phase_box["phase"] = "batch"
    b_pts, b_ivs = _interval_shapes(batch_events, cfg)
    want = interval_join(
        b_pts, b_ivs, bucket_seconds=cfg["bucket_sec"], point_time="ts",
        on="user_id",
    ).select("user_id", "point_id", "interval_id").toPandas()
    return got, want


def _minutes(spec: str | None) -> int:
    return int(spec.split()[0]) if spec else 0


def _window_starts_us(ts_us: int, w_us: int, s_us: int) -> list[int]:
    """Epoch-aligned window starts containing ts (Spark's window() grid:
    starts at multiples of slide since the epoch, UTC session tz)."""
    st = (ts_us // s_us) * s_us
    out = []
    while st > ts_us - w_us:
        out.append(st)
        st -= s_us
    return out


def simulate_disorder(pdf, cfg) -> tuple:
    """Pure-Python replay of the watermark protocol over the arrival
    schedule in pdf['_b'] — the batch twin's PREDICATE for the disorder
    family, pinned against Spark 4.1 by three targeted experiments
    (r11): with wm_eff[k] = max event time through batch k-1 minus delay
    (monotonic; the watermark IN EFFECT during batch k),

    * the LATE-DATA FILTER in batch k uses wm_eff[k-1] — one batch more
      lag than eviction: a row whose window closed only in the previous
      batch still merges into state (measured: a days-late row was
      aggregated and its expired window emitted the same batch);
    * EVICTION/EMISSION at the end of batch k uses wm_eff[k]: groups with
      window end <= wm_eff[k] are emitted once and removed;
    * availableNow's trailing no-data batch flushes with the final
      watermark, so the emitted set is exactly {windows: end <= final wm}.

    The filter/eviction stagger makes re-opened windows IMPOSSIBLE (a
    window evicted in batch j had end <= wm_eff[j] <= wm_eff[k-1] for any
    later batch k, so its stragglers are always filtered) — which the
    replay inherits by construction rather than tracking eviction state.

    Boundary conventions (end > wm to keep, end <= wm to emit) are
    untestable on this data by construction: window ends sit on minute
    multiples while the watermark inherits the max event time's
    microsecond entropy, so exact ties are measure-zero.

    Returns (expected_df, n_dropped, n_open_windows)."""
    import pandas as pd

    w_us = _minutes(cfg["window"]) * 60_000_000
    s_us = (_minutes(cfg["slide"]) or _minutes(cfg["window"])) * 60_000_000
    delay_us = _minutes(cfg["watermark"]) * 60_000_000
    key = cfg["key"]
    contribs: dict = {}
    wm_prev = 0  # wm_eff[k-1]: the late-data filter's watermark
    wm = 0       # wm_eff[k]:   the eviction watermark
    max_ts = 0
    n_dropped = 0
    for b in range(cfg["n_batches"]):
        batch = pdf[pdf["_b"] == b]
        keys = batch[key] if key else [None] * len(batch)
        for ts, kv, val in zip(batch["ts"], keys, batch["value"]):
            ts_us = pd.Timestamp(ts).value // 1000
            kept = [st for st in _window_starts_us(ts_us, w_us, s_us)
                    if st + w_us > wm_prev]
            if not kept:
                n_dropped += 1
            for st in kept:
                contribs.setdefault((st, kv), []).append(val)
        if len(batch):
            max_ts = max(max_ts, pd.Timestamp(batch["ts"].max()).value // 1000)
        wm_prev = wm
        wm = max(wm, max_ts - delay_us)
    rows = []
    n_open = 0
    for (st, kv), vals in sorted(contribs.items(), key=lambda x: str(x[0])):
        if st + w_us > wm:
            n_open += 1
            continue
        row = {"w_start": pd.Timestamp(st, unit="us"),
               "w_end": pd.Timestamp(st + w_us, unit="us")}
        if key:
            row[key] = kv
        if cfg["agg"] in ("count", "count_sum"):
            row["n_events"] = len(vals)
        if cfg["agg"] in ("sum", "count_sum"):
            row["total_value"] = round(sum(vals), 6)
        if cfg["agg"] == "min_max":
            row["min_value"] = round(min(vals), 6)
            row["max_value"] = round(max(vals), 6)
        rows.append(row)
    cols = ["w_start", "w_end"] + ([key] if key else []) + {
        "count": ["n_events"], "sum": ["total_value"],
        "min_max": ["min_value", "max_value"],
        "count_sum": ["n_events", "total_value"]}[cfg["agg"]]
    return pd.DataFrame(rows, columns=cols), n_dropped, n_open


def _disorder_schedule(batch_events, cfg):
    """events as pandas, sorted by ts, with the seeded arrival batch in
    '_b': time-contiguous chunks, a p_late fraction shifted 1..max_shift
    chunks later (bounded out-of-order arrival)."""
    rng = random.Random(cfg["seed"] ^ 0x5EED)
    pdf = (batch_events.select("event_id", "ts", "user_id", "event_type",
                               "value")
           .toPandas().sort_values("ts").reset_index(drop=True))
    nb = cfg["n_batches"]
    n = len(pdf)
    base = [i * nb // n for i in range(n)]
    pdf["_b"] = [
        min(nb - 1, b + (rng.randint(1, cfg["max_shift"])
                         if rng.random() < cfg["p_late"] else 0))
        for b in base
    ]
    return pdf


def _write_chunks(pdf, d: str, nb: int) -> None:
    """One parquet file per arrival batch; strictly increasing mtimes pin
    the micro-batch order under maxFilesPerTrigger=1."""
    for k in range(nb):
        path = os.path.join(d, f"chunk-{k:03d}.parquet")
        # coerce to microsecond timestamps: pandas writes ns by default,
        # which Spark reads back as BIGINT, not TIMESTAMP
        pdf[pdf["_b"] == k].drop(columns=["_b"]).to_parquet(
            path, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + 100 * k,) * 2)


def _chunked_stream(spark, d: str, watermark: str | None = None):
    from pyspark.sql import functions as F

    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(d)
              # pyarrow wrote tz-naive (TIMESTAMP_NTZ); watermarks require
              # TIMESTAMP — the cast reads the naive value in the session
              # tz (UTC), identical epoch to the source
              .withColumn("ts", F.col("ts").cast("timestamp")))
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    return stream


def _run_disorder(spark, cfg, batch_events, name, phase_box):
    """Bounded out-of-order arrival through the append-mode windowed
    aggregate vs simulate_disorder."""
    import shutil
    import tempfile

    pdf = _disorder_schedule(batch_events, cfg)
    d = tempfile.mkdtemp(prefix="fzdisorder")
    try:
        _write_chunks(pdf, d, cfg["n_batches"])
        stream = _chunked_stream(spark, d, watermark=cfg["watermark"])
        wcfg = {"op": "sliding" if cfg["slide"] else "tumbling",
                "window": cfg["window"], "slide": cfg["slide"],
                "key": cfg["key"], "agg": cfg["agg"]}
        out = _windowed(stream, wcfg, streaming=False)  # watermark applied above
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError("disorder stream did not finish in 240s")
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        phase_box["phase"] = "batch"
        want, n_dropped, n_open = simulate_disorder(pdf, cfg)
        return got, want, {"n_dropped": n_dropped, "n_open_windows": n_open}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def simulate_session_disorder(pdf, cfg) -> tuple:
    """Exact replay of the streaming session-window protocol over the
    arrival schedule in pdf['_b'] — the batch twin's predicate for the
    disorder_session family, pinned against Spark 4.1 by six targeted
    experiments (r12): with wm_eff[k] = max event time through batch k-1
    minus delay (monotonic; the watermark IN EFFECT during batch k),

    * LATE FILTER in batch k: a row is dropped iff its initial session
      END (ts + gap) <= wm_eff[k-1] — same one-batch lag as the windowed
      aggregate, and the tie DROPS (a row with ts+gap exactly equal to
      the filter watermark was measured dropped);
    * MERGE is boundary-INCLUSIVE: an event exactly at an open session's
      end extends it (batch session_window agrees), so two sessions merge
      iff start2 <= end1 and start1 <= end2;
    * EVICTION at the end of batch k emits sessions with end <= wm_eff[k]
      and removes them from state; the tie EVICTS (a session whose end
      equaled the eviction watermark was measured emitted, and a later
      adjacent straggler did NOT merge into it);
    * an evicted session never merges back: a kept straggler adjacent to
      one starts a NEW session — OVERLAPPING emitted sessions are legal
      streaming output (measured: [10:00,10:10) emitted, then straggler
      10:09 emitted separately as [10:09,10:19)) that the all-at-once
      batch twin would merge, which is WHY the replay tracks eviction
      state instead of reusing the batch operator;
    * availableNow's trailing no-data batch flushes sessions with
      end <= the final watermark.

    Returns (expected_df, n_dropped, n_open_sessions)."""
    import pandas as pd

    gap_us = _minutes(cfg["gap"]) * 60_000_000
    delay_us = _minutes(cfg["watermark"]) * 60_000_000
    key = cfg["key"]
    state: dict = {}  # key -> list of open [start, end, vals]
    emitted: list = []  # (start, end, key, vals)
    wm_prev = 0  # wm_eff[k-1]: the late-data filter's watermark
    wm = 0       # wm_eff[k]:   the eviction watermark
    max_ts = 0
    n_dropped = 0
    for b in range(cfg["n_batches"]):
        batch = pdf[pdf["_b"] == b]
        for ts, kv, val in zip(batch["ts"], batch[key], batch["value"]):
            ts_us = pd.Timestamp(ts).value // 1000
            if ts_us + gap_us <= wm_prev:
                n_dropped += 1
                continue
            start, end, vals = ts_us, ts_us + gap_us, [val]
            keep = []
            for s0, e0, v0 in state.get(kv, []):
                if s0 <= end and start <= e0:  # inclusive overlap
                    start, end = min(start, s0), max(end, e0)
                    vals = vals + v0
                else:
                    keep.append([s0, e0, v0])
            keep.append([start, end, vals])
            state[kv] = keep
        if len(batch):
            max_ts = max(max_ts, pd.Timestamp(batch["ts"].max()).value // 1000)
        for kv, sess in state.items():
            still = []
            for s0, e0, v0 in sess:
                if e0 <= wm:
                    emitted.append((s0, e0, kv, v0))
                else:
                    still.append([s0, e0, v0])
            state[kv] = still
        wm_prev = wm
        wm = max(wm, max_ts - delay_us)
    n_open = 0
    for kv, sess in state.items():  # trailing no-data batch: final wm
        for s0, e0, v0 in sess:
            if e0 <= wm:
                emitted.append((s0, e0, kv, v0))
            else:
                n_open += 1
    rows = []
    for s0, e0, kv, vals in sorted(emitted, key=lambda x: (x[0], str(x[2]))):
        row = {"w_start": pd.Timestamp(s0, unit="us"),
               "w_end": pd.Timestamp(e0, unit="us"), key: kv}
        if cfg["agg"] in ("count", "count_sum"):
            row["n_events"] = len(vals)
        if cfg["agg"] in ("sum", "count_sum"):
            row["total_value"] = round(sum(vals), 6)
        if cfg["agg"] == "min_max":
            row["min_value"] = round(min(vals), 6)
            row["max_value"] = round(max(vals), 6)
        rows.append(row)
    cols = ["w_start", "w_end", key] + {
        "count": ["n_events"], "sum": ["total_value"],
        "min_max": ["min_value", "max_value"],
        "count_sum": ["n_events", "total_value"]}[cfg["agg"]]
    return pd.DataFrame(rows, columns=cols), n_dropped, n_open


def _run_disorder_session(spark, cfg, batch_events, name, phase_box):
    """Chunked out-of-order arrival through the append-mode streaming
    session_window aggregate vs simulate_session_disorder."""
    import shutil
    import tempfile

    pdf = _disorder_schedule(batch_events, cfg)
    d = tempfile.mkdtemp(prefix="fzdissess")
    try:
        _write_chunks(pdf, d, cfg["n_batches"])
        stream = _chunked_stream(spark, d, watermark=cfg["watermark"])
        wcfg = {"op": "session", "gap": cfg["gap"],
                "key": cfg["key"], "agg": cfg["agg"]}
        out = _windowed(stream, wcfg, streaming=False)  # watermark applied above
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError("disorder-session stream did not finish in 240s")
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        phase_box["phase"] = "batch"
        want, n_dropped, n_open = simulate_session_disorder(pdf, cfg)
        return got, want, {"n_dropped": n_dropped, "n_open_sessions": n_open}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def simulate_interval_watermark(pdf, cfg) -> tuple:
    """Replay the GLOBAL watermark of the disorder_interval join — the min
    over its two watermark nodes (points' ts minus point_watermark,
    intervals' start_ts minus interval_watermark), each node the running
    max of its column, global monotone — and classify every row:
    safe = its watermark column strictly above the global watermark IN
    EFFECT during its arrival batch (computed from batches strictly
    before it — the value Spark plans batch k with; no one-batch filter
    lag credited), so a safe row is one Spark's contract guarantees is
    never treated as late. Returns (safe_point_ids, safe_interval_ids,
    n_unsafe_rows)."""
    import pandas as pd

    len_us = cfg["len_min"] * 60_000_000
    d_pt = _minutes(cfg["point_watermark"]) * 60_000_000
    d_iv = _minutes(cfg["interval_watermark"]) * 60_000_000
    iv_off = len_us if cfg["direction"] == "lookback" else 0
    pts = pdf[pdf["event_type"] == cfg["point_type"]]
    ivs = pdf[pdf["event_type"] == cfg["interval_type"]]
    safe_pt: set = set()
    safe_iv: set = set()
    n_unsafe = 0
    wm = 0
    pt_max = iv_max = None
    for b in range(cfg["n_batches"]):
        bp = pts[pts["_b"] == b]
        bi = ivs[ivs["_b"] == b]
        # classify against the watermark in effect DURING batch b (maxima
        # from batches < b only) ...
        for eid, ts in zip(bp["event_id"], bp["ts"]):
            if pd.Timestamp(ts).value // 1000 > wm:
                safe_pt.add(eid)
            else:
                n_unsafe += 1
        for eid, ts in zip(bi["event_id"], bi["ts"]):
            if pd.Timestamp(ts).value // 1000 - iv_off > wm:
                safe_iv.add(eid)
            else:
                n_unsafe += 1
        # ... then advance the nodes with this batch's maxima
        if len(bp):
            m = pd.Timestamp(bp["ts"].max()).value // 1000
            pt_max = m if pt_max is None else max(pt_max, m)
        if len(bi):
            m = pd.Timestamp(bi["ts"].max()).value // 1000 - iv_off
            iv_max = m if iv_max is None else max(iv_max, m)
        node_pt = (pt_max - d_pt) if pt_max is not None else 0
        node_iv = (iv_max - d_iv) if iv_max is not None else 0
        wm = max(wm, min(node_pt, node_iv))
    return safe_pt, safe_iv, n_unsafe


def _run_disorder_interval(spark, cfg, batch_events, name, phase_box):
    """Chunked out-of-order arrival through interval_join_stream, checked
    against the sound stream-stream-join SANDWICH (module docstring):
    sure_pairs (both rows safe per simulate_interval_watermark) must all
    be emitted, and every emitted pair must be in the batch twin's result
    — both as MULTISETS, so duplicate emission fails too. Returns
    (ok, detail, extra)."""
    import shutil
    import tempfile
    from collections import Counter

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.interval import (
        interval_join,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        interval_join_stream,
    )

    pdf = _disorder_schedule(batch_events, cfg)
    d = tempfile.mkdtemp(prefix="fzdisiv")
    try:
        _write_chunks(pdf, d, cfg["n_batches"])
        ev = _chunked_stream(spark, d)  # interval_join_stream adds watermarks
        s_pts, s_ivs = _interval_shapes(ev, cfg)
        out = interval_join_stream(
            s_pts, s_ivs, bucket_seconds=cfg["bucket_sec"],
            max_interval=f"{cfg['len_min']} minutes", on="user_id",
            point_watermark=cfg["point_watermark"],
            interval_watermark=cfg["interval_watermark"],
        ).select("user_id", "point_id", "interval_id")
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError("disorder-interval stream did not finish in 240s")
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        phase_box["phase"] = "batch"
        b_pts, b_ivs = _interval_shapes(batch_events, cfg)
        want = interval_join(
            b_pts, b_ivs, bucket_seconds=cfg["bucket_sec"], point_time="ts",
            on="user_id",
        ).select("user_id", "point_id", "interval_id").toPandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    safe_pt, safe_iv, n_unsafe = simulate_interval_watermark(pdf, cfg)
    cols = ["user_id", "point_id", "interval_id"]
    got_ms = Counter(got[cols].itertuples(index=False, name=None))
    want_ms = Counter(want[cols].itertuples(index=False, name=None))
    sure_ms = Counter(t for t in want_ms.elements()
                      if t[1] in safe_pt and t[2] in safe_iv)
    missing = sure_ms - got_ms   # guaranteed pairs the stream failed to emit
    fabricated = got_ms - want_ms  # pairs (or duplicates) batch never produced
    ok = not missing and not fabricated
    detail = ("" if ok else
              f"missing {sum(missing.values())} sure pairs, "
              f"fabricated {sum(fabricated.values())} pairs "
              f"(e.g. {list(missing)[:3]} / {list(fabricated)[:3]})")
    extra = {"n_pairs": int(sum(got_ms.values())),
             "n_batch_pairs": int(sum(want_ms.values())),
             "n_sure_pairs": int(sum(sure_ms.values())),
             "n_unsafe_rows": int(n_unsafe)}
    return ok, detail, extra


def run_configs(spark, sf_dir: str, seeds: list[int], log=print) -> list[dict]:
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
        load_table,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming import (
        read_events_stream,
    )

    normalize = _normalize_fn()
    batch_events = load_table(spark, sf_dir, "events")
    results = []
    for i, seed in enumerate(seeds):
        cfg = gen_config(seed)
        rec = dict(cfg)
        name = "fz" + uuid.uuid4().hex[:12]
        # which side raised: the runners flip this to "batch" after the
        # stream side completes, so a batch-twin failure is never
        # mislabeled stream_err (ADVICE r10)
        phase_box = {"phase": "stream"}
        extra: dict = {}
        try:
            if cfg["op"] == "interval":
                got, want = _run_interval(
                    spark, cfg, read_events_stream(spark, sf_dir),
                    batch_events, name, phase_box)
            elif cfg["op"] == "disorder":
                got, want, extra = _run_disorder(
                    spark, cfg, batch_events, name, phase_box)
            elif cfg["op"] == "disorder_session":
                got, want, extra = _run_disorder_session(
                    spark, cfg, batch_events, name, phase_box)
            elif cfg["op"] == "disorder_interval":
                ok, detail, extra = _run_disorder_interval(
                    spark, cfg, batch_events, name, phase_box)
                rec.update(extra)
                rec["status"] = "ok" if ok else "diff"
                if not ok:
                    rec["detail"] = detail
                    log(f"# [{i}] seed={seed} {cfg['op']}: DIFF {detail}")
                results.append(rec)
                continue  # sandwich-checked above; skip the exact compare
            else:
                stream = _windowed(read_events_stream(spark, sf_dir), cfg,
                                   streaming=True)
                q = (stream.writeStream.outputMode("complete")
                     .format("memory").queryName(name)
                     .trigger(availableNow=True).start())
                if not q.awaitTermination(180):
                    # partial memory-sink contents must not be diffed, and
                    # the still-running query must not leak into the next
                    # config's session (ADVICE r10)
                    q.stop()
                    raise TimeoutError("stream did not finish in 180s")
                got = spark.sql(f"SELECT * FROM {name}").toPandas()
                phase_box["phase"] = "batch"
                want = _windowed(batch_events, cfg,
                                 streaming=False).toPandas()
        except TimeoutError as e:
            rec["status"] = "timeout"
            rec["error"] = str(e)
            results.append(rec)
            log(f"# [{i}] seed={seed}: TIMEOUT {rec['error']}")
            continue
        except Exception as e:
            rec["status"] = f"{phase_box['phase']}_err"
            rec["error"] = str(e).split("\n")[0][:300]
            results.append(rec)
            log(f"# [{i}] seed={seed}: {rec['status'].upper()} "
                f"{rec['error'][:120]}")
            continue
        finally:
            spark.catalog.dropTempView(name) if name in [
                t.name for t in spark.catalog.listTables()] else None
        gc, gr = normalize(got)
        wc, wr = normalize(want)
        rec["rows"] = len(gr)
        rec.update(extra)
        if gc == wc and gr == wr:
            rec["status"] = "ok"
        else:
            rec["status"] = "diff"
            rec["detail"] = (f"columns {gc} vs {wc}" if gc != wc else
                             f"rows {len(gr)} vs {len(wr)}")
            log(f"# [{i}] seed={seed} {cfg['op']}: DIFF {rec['detail']}")
        results.append(rec)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--seed", type=int, default=7007)
    ap.add_argument("--ops", nargs="*", default=None,
                    help="restrict to these op families (e.g. --ops disorder "
                         "session): seeds are scanned in order and kept only "
                         "when their generated config matches, so a targeted "
                         "sweep still reproduces from (seed, n, ops) alone")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                                           "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_streaming_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark

    spark = get_spark(app_name="vlds-fuzz-streaming", shuffle_partitions=8)
    if args.ops:
        wanted = set(args.ops)
        seeds, i = [], 0
        while len(seeds) < args.n and i < args.n * 1000:
            seed = args.seed * 1000 + i
            if gen_config(seed)["op"] in wanted:
                seeds.append(seed)
            i += 1
    else:
        seeds = [args.seed * 1000 + i for i in range(args.n)]
    results = run_configs(spark, args.sf_dir, seeds,
                          log=lambda m: print(m, file=sys.stderr))
    counts: dict = {}
    for r in results:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    bad = [r for r in results if r["status"] != "ok"]
    # the disorder dimensions are only evidence if they actually exercised
    # lateness somewhere in the sweep — record the totals
    n_disorder = sum(1 for r in results if r["op"].startswith("disorder"))
    n_dropped = sum(r.get("n_dropped", 0) for r in results)
    n_unsafe = sum(r.get("n_unsafe_rows", 0) for r in results)
    with open(args.out, "w") as f:
        json.dump({"summary": {"seed": args.seed, "n": len(results),
                               "sf_dir": args.sf_dir, "counts": counts,
                               "disorder_configs": n_disorder,
                               "watermark_dropped_rows": n_dropped,
                               "interval_unsafe_rows": n_unsafe,
                               "failures": bad},
                   "configs": results}, f, indent=1)
        f.write("\n")
    print(json.dumps(dict(counts, disorder_configs=n_disorder,
                          watermark_dropped_rows=n_dropped,
                          interval_unsafe_rows=n_unsafe)))
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
