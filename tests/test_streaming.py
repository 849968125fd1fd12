"""Streaming tests: drive each streaming transform with the file source over
the harness parquet and compare against the batch equivalent."""

import uuid

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming import (
    read_events_stream,
    session_event_counts,
    sliding_event_counts,
    stateful_user_running_stats,
    tumbling_event_counts,
)


def _run_to_memory(df, mode):
    name = "m" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream):
    name = _run_to_memory(tumbling_event_counts(events_stream), "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type): (r.n, round(r.tv, 6))
        for r in batch.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
        .collect()
    }
    assert got == want


def test_sliding_stream_counts_sum_to_double(spark, sf_dir, events_stream):
    name = _run_to_memory(sliding_event_counts(events_stream), "complete")
    total = spark.sql(f"SELECT sum(n_events) AS s FROM {name}").first()["s"]
    n_batch = load_table(spark, sf_dir, "events").count()
    assert total == 2 * n_batch  # 10min window / 5min slide -> 2 panes/event


def test_session_stream_matches_batch_session_count(spark, sf_dir, events_stream):
    name = _run_to_memory(session_event_counts(events_stream), "complete")
    got = (
        spark.sql(f"SELECT user_id, count(*) AS n FROM {name} GROUP BY user_id")
        .orderBy("user_id")
        .collect()
    )
    batch = load_table(spark, sf_dir, "events")
    want = (
        batch.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.n) for r in got] == [(r.user_id, r.n) for r in want]


def test_stateful_running_stats(spark, sf_dir, events_stream):
    name = _run_to_memory(stateful_user_running_stats(events_stream), "update")
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want
