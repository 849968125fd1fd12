"""Harness parquet table loader.

The driver's ``events`` table carries a nanosecond-precision parquet
timestamp, which Spark's vectorized reader rejects outright (DuckDB and
Arrow read it fine). The loader flips the runtime-settable
``spark.sql.legacy.parquet.nanosAsLong`` conf and converts the resulting
int64 nanos to a microsecond timestamp — lossless here, since the generated
data has no sub-microsecond component.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Runtime-settable confs the engine's semantics depend on, applied on every
# table load so queries behave identically under a FOREIGN SparkSession
# (e.g. the correctness driver's): Spark 4 defaults ANSI mode ON (wrap-around
# hash arithmetic in MinHash/SimHash would throw on overflow) and the session
# timezone may not be UTC (epoch conversions would shift vs the UTC-naive
# DuckDB oracle).
_SEMANTIC_CONFS = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # nanosecond parquet timestamps read as int64 nanos instead of being
    # rejected by the vectorized reader. Pinned here (not just around the
    # events load) so behavior is ORDER-INDEPENDENT: previously the first
    # events load flipped it session-globally anyway, silently changing how
    # any other ns-timestamp parquet read AFTER it — same code, different
    # schema depending on call order. Under this engine's sessions, ns
    # columns are always bigint; only the events loader converts (ts).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_semantic_confs(spark: SparkSession) -> None:
    """Pin ANSI=off and UTC on ``spark`` (see ``_SEMANTIC_CONFS``).

    NOTE: this mutates SESSION-GLOBAL runtime confs — unrelated queries on
    the same session observe the change (ANSI arithmetic stops throwing,
    timestamps render in UTC). That is the deliberate contract of
    ``load_table``: the engine's operators are only correct under these
    semantics, and neither conf is scope-able per-read in Spark. Callers
    embedding this engine in a session whose other workloads need ANSI-on
    or a local timezone should use a separate SparkSession."""
    for k, v in _SEMANTIC_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


# Under-parallelized-scan floor (guide §2.5 "input skew: one huge
# unsplittable file ... repartition immediately after the read"): the harness
# tables are single parquet files with ONE row group, and a row group is the
# parquet split atom — every scan plans as ONE task, so all scan-rooted map
# work (MinHash shingle hashing, SimHash bit votes, winnowing gram hashes,
# per-row text statistics) serializes onto one core of local[N]. Corpus
# tables get a round-robin repartition to defaultParallelism when the scan
# would otherwise produce fewer splits. Scale-adaptive by construction: a
# production corpus scans as size/maxPartitionBytes >= parallelism splits,
# making the branch a no-op — this is a floor on scan parallelism, not a
# local tuning constant. 0 disables spreading entirely.
_SPREAD_MIN_BYTES_DEFAULT = 262_144

# Spreading is OPT-IN per call site, not a per-table default. Whether the
# repartition pays is a property of the CONSUMER's per-row work, not of the
# table: the A/B probe (plans/r13/probe_spread_scan.json) and the full
# before/after bench (OPTIMIZATION_r13.md) measured both directions on the
# same documents table — hash-family / text-statistics consumers gain 2-7x
# (minhash_md5_star 5.06->1.44s, winnow_fingerprints 3.45->0.46s,
# doc_quality_report 4.18->2.25s, embedding_split_contamination
# 2.10->0.45s), while light consumers of the SAME table pay the exchange
# for nothing (doc_exact_dedup 0.18->0.48s — one md5 per row) and
# driver-loop consumers pay it per round (pipeline_hierarchical_mock
# 3.25->4.72s, doc_dup_clusters 4.16->5.00s). Relational/events scans
# likewise regress (pricing_summary 0.23->0.55s, events_resample
# 0.96->1.22s): per-row work is a handful of comparisons, and the dims are
# broadcast sides where an exchange before BroadcastExchange is pure waste.


def _spread_min_bytes() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_SPREAD_MIN_BYTES",
                                  str(_SPREAD_MIN_BYTES_DEFAULT)))
    except ValueError:
        return _SPREAD_MIN_BYTES_DEFAULT


def spread_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Restore scan parallelism for a single-row-group parquet file (see
    ``_SPREAD_MIN_BYTES_DEFAULT``). Round-robin ``repartition(n)`` is
    deterministic under task retry (sort-before-repartition, SPARK-23207)
    and row-order-insensitive downstream: every registry query either
    aggregates, joins, or sorts, and the oracle comparison is an
    order-insensitive value hash with rounded floats."""
    min_bytes = _spread_min_bytes()
    if min_bytes <= 0:
        return df
    try:
        size = os.path.getsize(path)
    except OSError:
        return df
    if size < min_bytes:
        return df
    try:
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except (TypeError, ValueError):
        max_split = 128 * 1024 * 1024
    target = spark.sparkContext.defaultParallelism
    if -(-size // max_split) >= target:  # enough natural splits: no-op
        return df
    return df.repartition(target)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load a harness table, pinning session confs the engine depends on
    (``ensure_semantic_confs`` — session-global, see its docstring; plus
    ``nanosAsLong`` for the events table's ns timestamps). ``spread=True``
    restores scan parallelism for a consumer whose per-row map work dwarfs
    one round-robin exchange of the rows (``spread_scan``; see the policy
    comment above ``_SPREAD_MIN_BYTES_DEFAULT``)."""
    ensure_semantic_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spread_scan(spark, df, path) if spread else df
