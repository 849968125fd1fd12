"""Integration: the composed training-data prep pipeline (quality gate ->
repetition/entropy filter -> exact+near dedup -> split -> decontamination ->
epoch mixing -> packing) runs end-to-end and upholds its invariants on the
harness corpus."""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pipeline(spark, sf_dir):
    path = os.path.join(os.path.dirname(__file__), "..", "examples", "prepare_training_data.py")
    spec = importlib.util.spec_from_file_location("prepare_training_data", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.prepare(spark, sf_dir, max_tokens=256, n_shards=4)


def test_splits_partition_the_survivors(pipeline):
    split, _, _, _, _ = pipeline
    counts = {r["split"]: r["count"] for r in split.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert counts.get("train", 0) > 0
    # one split label per doc
    assert split.select("doc_id").distinct().count() == split.count()


def test_contamination_rows_are_valid_pairs(pipeline):
    split, contamination, _, _, _ = pipeline
    rows = contamination.collect()
    test_ids = {r["doc_id"] for r in split.filter(F.col("split") == "test").collect()}
    train_ids = {r["doc_id"] for r in split.filter(F.col("split") == "train").collect()}
    for r in rows:
        assert r["test_id"] in test_ids
        assert r["train_id"] in train_ids
        assert 0.8 <= float(r["containment"]) <= 1.0


def test_bins_conserve_tokens_within_overflow_bound(pipeline):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
        ws_token_count,
    )

    split, _, mixed, _, bins = pipeline
    rows = bins.collect()
    assert all(r["n_docs"] >= 1 for r in rows)
    # conservation: every MIXED-stream token lands in exactly one bin
    # (packing never drops or splits a row; replicas pack independently)
    mixed_tokens = mixed.agg(F.sum(ws_token_count("text")).alias("t")).first()["t"]
    assert sum(r["sum_tokens"] for r in rows) == mixed_tokens
    # greedy mode: a bin exceeds the budget only when a single oversized
    # row sits alone in it
    max_doc = mixed.agg(F.max(ws_token_count("text")).alias("m")).first()["m"]
    for r in rows:
        assert r["sum_tokens"] <= 256 or r["n_docs"] == 1
    assert max_doc is not None


def test_epoch_mixing_invariants(pipeline):
    split, _, mixed, _, _ = pipeline
    train = split.filter(F.col("split") == "train")
    # every mixed row's doc comes from the train split, never val/test
    assert mixed.join(train, "doc_id", "left_anti").count() == 0
    # replicas are identity-distinct via (doc_id, epoch)
    assert mixed.select("doc_id", "epoch").distinct().count() == mixed.count()
    # per-doc copies differ by at most 1 from the weight floor (frac rule)
    per_doc = mixed.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 3 for r in per_doc)  # weights 0.75..2.5


def test_packing_uses_every_shard(pipeline):
    # regression: mix_id = doc_id*8 + epoch made shard (= mix_id % n_shards)
    # degenerate to the epoch index — one giant shard, most shards empty.
    # With the epoch in the high bits the shard comes from doc_id and all
    # n_shards=4 shards carry bins.
    _, _, _, packed, _ = pipeline
    shards = sorted(r["shard"] for r in packed.select("shard").distinct().collect())
    assert shards == [0, 1, 2, 3]
