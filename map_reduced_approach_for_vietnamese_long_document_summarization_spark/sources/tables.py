"""Harness parquet table loader.

The driver's ``events`` table carries a nanosecond-precision parquet
timestamp, which Spark's vectorized reader rejects outright (DuckDB and
Arrow read it fine). The loader flips the runtime-settable
``spark.sql.legacy.parquet.nanosAsLong`` conf and converts the resulting
int64 nanos to a microsecond timestamp — lossless here, since the generated
data has no sub-microsecond component.
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a harness table, pinning session confs the engine depends on
    (``ensure_semantic_confs`` — session-global, see its docstring; plus
    ``nanosAsLong`` for the events table's ns timestamps)."""
    ensure_semantic_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
