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
    op = rng.choice(["tumbling", "sliding", "session", "interval"])
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


def _run_interval(spark, cfg, events_stream, batch_events, name):
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
    q.awaitTermination(180)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    b_pts, b_ivs = _interval_shapes(batch_events, cfg)
    want = interval_join(
        b_pts, b_ivs, bucket_seconds=cfg["bucket_sec"], point_time="ts",
        on="user_id",
    ).select("user_id", "point_id", "interval_id").toPandas()
    return got, want


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
        try:
            if cfg["op"] == "interval":
                got, want = _run_interval(
                    spark, cfg, read_events_stream(spark, sf_dir),
                    batch_events, name)
            else:
                stream = _windowed(read_events_stream(spark, sf_dir), cfg,
                                   streaming=True)
                q = (stream.writeStream.outputMode("complete")
                     .format("memory").queryName(name)
                     .trigger(availableNow=True).start())
                q.awaitTermination(180)
                got = spark.sql(f"SELECT * FROM {name}").toPandas()
                want = _windowed(batch_events, cfg,
                                 streaming=False).toPandas()
        except Exception as e:
            rec["status"] = "stream_err"
            rec["error"] = str(e).split("\n")[0][:300]
            results.append(rec)
            log(f"# [{i}] seed={seed}: STREAM ERROR {rec['error'][:120]}")
            continue
        finally:
            spark.catalog.dropTempView(name) if name in [
                t.name for t in spark.catalog.listTables()] else None
        gc, gr = normalize(got)
        wc, wr = normalize(want)
        rec["rows"] = len(gr)
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
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                                           "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_streaming_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark

    spark = get_spark(app_name="vlds-fuzz-streaming", shuffle_partitions=8)
    seeds = [args.seed * 1000 + i for i in range(args.n)]
    results = run_configs(spark, args.sf_dir, seeds,
                          log=lambda m: print(m, file=sys.stderr))
    counts: dict = {}
    for r in results:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    bad = [r for r in results if r["status"] != "ok"]
    with open(args.out, "w") as f:
        json.dump({"summary": {"seed": args.seed, "n": len(results),
                               "sf_dir": args.sf_dir, "counts": counts,
                               "failures": bad},
                   "configs": results}, f, indent=1)
        f.write("\n")
    print(json.dumps(counts))
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
