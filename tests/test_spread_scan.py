"""Round-13 optimization pins: the spread-scan mechanism and the
incremental-MinHash sentinel-join elision.

* ``spread_scan`` (sources/tables.py) restores scan parallelism for
  single-row-group parquet files (guide §2.5 input-skew fix). These tests
  pin its gating logic — size floor, env disable, natural-splits no-op —
  and that opting in changes ONLY the partitioning, never the rows.
* ``minhash_incremental_fast`` builds signatures with
  ``include_missing=False`` because ``minhash_incremental_pairs`` filters
  sentinel signatures on both sides anyway (OPTIMIZATION_r13.md change 2).
  The equivalence test runs a corpus WITH shingle-less docs through both
  formulations so the elision can never silently change the pair set.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    minhash_incremental_pairs,
    minhash_signatures,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.tables import (
    load_table,
    spread_scan,
)


def _docs_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def test_spread_opt_in_changes_partitioning_not_rows(spark, sf_dir):
    base = load_table(spark, sf_dir, "documents")
    spread = load_table(spark, sf_dir, "documents", spread=True)
    size = os.path.getsize(_docs_path(sf_dir))
    min_bytes = int(os.environ.get("SPARK_GRAFT_SPREAD_MIN_BYTES", "262144"))
    if size >= min_bytes:
        assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # rows identical either way (round-robin repartition only moves rows)
    a = sorted(r["doc_id"] for r in base.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in spread.select("doc_id").collect())
    assert a == b


def test_spread_default_is_off(spark, sf_dir):
    # opt-in policy: a bare load_table must plan the plain scan with no
    # repartition exchange (light consumers measurably regress under it)
    plan = load_table(spark, sf_dir, "documents")._jdf.queryExecution().toString()
    assert "RoundRobinPartitioning" not in plan


def test_spread_floor_and_env_disable(spark, sf_dir, monkeypatch):
    df = spark.read.parquet(_docs_path(sf_dir))
    # env knob 0 disables spreading entirely (the probes' base mode)
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_MIN_BYTES", "0")
    assert spread_scan(spark, df, _docs_path(sf_dir)) is df
    # a floor above the file size leaves the scan alone (small SFs: the
    # driver's sf0.001/sf0.01 correctness runs never see a spread plan)
    monkeypatch.setenv(
        "SPARK_GRAFT_SPREAD_MIN_BYTES",
        str(os.path.getsize(_docs_path(sf_dir)) + 1),
    )
    assert spread_scan(spark, df, _docs_path(sf_dir)) is df


def test_spread_natural_splits_noop(spark, sf_dir, monkeypatch):
    # when the scan already plans >= defaultParallelism natural splits
    # (ceil(size / maxPartitionBytes)), spreading must be a no-op — the
    # production-corpus branch, and the CPUS=1 guard (ceil >= 1 always)
    df = spark.read.parquet(_docs_path(sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_MIN_BYTES", "1")
    size = os.path.getsize(_docs_path(sf_dir))
    target = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # shrink the split size so the file "naturally" covers the cores
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(1, size // (target + 1))))
        assert spread_scan(spark, df, _docs_path(sf_dir)) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_incremental_fast_sentinel_elision_equivalence(spark):
    # corpus WITH shingle-less docs (NULL / empty / < 3 tokens) on both
    # sides of the batch split: the include_missing=False formulation must
    # produce the identical pair set, because minhash_incremental_pairs
    # drops sentinel rows regardless of whether the signature table
    # carried them
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again!"),
        (2, None),
        (3, ""),
        (4, "two tokens"),
        (400, "the quick brown fox jumps over the lazy dog again and again"),
        (401, "completely different text about spark shuffles and parquet files"),
        (402, "  "),
        (403, "one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(include_missing: bool):
        sigs = minhash_signatures(
            docs, n_hashes=16, include_missing=include_missing
        )
        new = sigs.filter(F.col("doc_id") >= 400)
        corpus = sigs.filter(F.col("doc_id") < 400)
        out = minhash_incremental_pairs(
            new, corpus, n_hashes=16, n_bands=4, threshold=0.5
        )
        return sorted(
            (r["id1"], r["id2"], round(r["est_jaccard"], 6)) for r in out.collect()
        )

    with_join = pairs(True)
    without = pairs(False)
    assert with_join == without
    # the planted near-dup must actually be found (guard against a
    # vacuously-equal empty result)
    assert any(p[:2] == (0, 400) for p in without)
