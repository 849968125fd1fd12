"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` in one JVM, but every conf here is chosen so
the same code runs unchanged on a 1000-executor cluster: AQE for runtime
shuffle-partition coalescing and skew-join handling, Arrow for the pandas-UDF
boundary, UTC session timezone so results are oracle-comparable, and a
shuffle-partition count sized to the local core count rather than the
200-partition default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # 128 MiB parquet split size: good balance of task count vs task overhead
    # at TB scale; harmless locally.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Small dims (region/nation/supplier, reference summaries, doc trees) are
    # broadcast; 64 MiB threshold keeps star-schema joins shuffle-free.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    # driver heap for the local[N] single-JVM harness box (128 GiB host).
    # Env-overridable because the default is wrong off that box in BOTH
    # directions: on a small laptop -Xmx48g invites the OS OOM-killer, and
    # under spark-submit / an existing session the setting is silently
    # ignored anyway (JVM already started) — set it on the submit command
    # there.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    # managed tables (bucketed layouts) land outside the source tree;
    # per-process suffix avoids cross-session collisions on shared hosts
    "spark.sql.warehouse.dir": f"/tmp/vlds-spark-warehouse-{os.getpid()}",
    # Legacy (pre-4.0) arithmetic semantics: hash-family derivations (MinHash,
    # SimHash) rely on wrap-around 64-bit multiply, which ANSI mode turns into
    # runtime errors. Engine expressions guard their own divisions/casts.
    "spark.sql.ansi.enabled": "false",
    # The signature aggregates are WIDE on purpose (64 min/sum columns per
    # doc — MinHash/SimHash partial aggregation), which overflows the
    # default whole-stage-codegen field cap (100) and silently drops the
    # hot agg loop to interpreted per-expression evaluation. 500 keeps
    # those plans codegen'd (measured: 64-hash MinHash signature agg
    # 1.91s -> 1.36s at sf0.1; debiased interleaved A/B -5..-12% across
    # the minhash family, neutral on narrow plans). Expression-count
    # dependent, not data- or core-count-dependent, so it holds at any
    # scale; generated aggregate code is split per function by
    # spark.sql.codegen.aggregate.splitAggregateFunc (default on).
    "spark.sql.codegen.maxFields": "500",
}


def get_spark(
    app_name: str = "vlds-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` (default 32) sizes local parallelism and the
    shuffle-partition count; on a real cluster pass ``master`` explicitly and
    leave shuffle partitions to AQE's coalescing.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
