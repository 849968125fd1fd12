"""Interleaved A/B probe for RUNTIME SQL confs (guide §1.2 step 3 / §3.1).

Same JVM, same session: each round runs every probed query once per arm,
with the arm's confs set immediately before the rep and restored after —
so both arms ride the same box-noise profile and the diff isolates the
conf, not the minute. Use for runtime-settable confs only (join strategy
selection, AQE knobs); JVM-start confs (io codec, memory) need separate
sessions and a calibrated comparison instead.

    python examples/probe_conf_ab.py q1 q2 ... \
        --arm "shj:spark.sql.join.preferSortMergeJoin=false" \
        [--rounds 4]

Arms are "label:key=val[,key=val...]"; the implicit arm "base" runs with
the session defaults. Prints per-query per-arm rep arrays + min, and a
JSON map {query: {arm: {reps, min}}} on stdout.
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--arm", action="append", default=[],
                    help='label:key=val[,key=val...] — confs for this arm')
    args = ap.parse_args()

    arms: list[tuple[str, dict[str, str]]] = [("base", {})]
    for spec in args.arm:
        label, sep, body = spec.partition(":")
        if not sep or not label or not body:
            ap.error(f"--arm expects label:key=val[,key=val...], got {spec!r}")
        confs = {}
        for kv in body.split(","):
            k, s2, v = kv.partition("=")
            if not s2:
                ap.error(f"bad conf {kv!r} in arm {label!r}")
            confs[k] = v
        arms.append((label, confs))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vlds-conf-ab")
    defaults = {}
    for _, confs in arms:
        for k in confs:
            if k not in defaults:
                defaults[k] = spark.conf.get(k, None)

    # warm every (query, arm) pair once so no timed rep carries plan
    # compilation or scan cold-start (same rule as probe_interleaved)
    def _set(confs):
        for k, v in confs.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    for label, confs in arms:
        _set(confs)
        for name in args.names:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        _set({k: defaults[k] for k in confs})

    reps: dict = {n: {label: [] for label, _ in arms} for n in args.names}
    for _ in range(args.rounds):
        for name in args.names:
            for label, confs in arms:
                _set(confs)
                try:
                    spark.catalog.clearCache()
                    gc.collect()
                    release_rdds(spark.sparkContext,
                                 persistent_rdd_ids(spark.sparkContext),
                                 blocking=True)
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite").save()
                    reps[name][label].append(round(time.perf_counter() - t0, 3))
                finally:
                    _set({k: defaults[k] for k in confs})

    out = {}
    for name, by_arm in reps.items():
        out[name] = {
            label: {"reps": arr, "min": min(arr)} for label, arr in by_arm.items()
        }
        base_min = out[name]["base"]["min"]
        line = " ".join(
            f"{label}={d['min']}s({round(d['min'] / base_min, 2)}x)"
            for label, d in out[name].items()
        )
        print(f"# {name}: {line}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
