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


def test_stream_static_dim_enrichment(spark, sf_dir, events_stream):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        enrich_stream_with_dim,
    )

    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = enrich_stream_with_dim(events_stream, dim, {"user_id": "c_custkey"})
    agg = enriched.groupBy("c_mktsegment").count()
    name = _run_to_memory(agg, "complete")
    got = {
        r.c_mktsegment: r["count"] for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = load_table(spark, sf_dir, "events").join(
        dim, F.col("user_id") == F.col("c_custkey"), "left"
    )
    want = {
        r.c_mktsegment: r["count"] for r in batch.groupBy("c_mktsegment").count().collect()
    }
    assert got == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data handling: a row older than the operative watermark is
    dropped in append mode. The watermark computed from batch N's data
    becomes operative in batch N+1 and windows it closes are finalized
    there — so the late row arrives in batch 3, after the 10:00-10:10
    window's state was evicted."""
    import os
    import time as _time

    import pandas as pd

    d = tmp_path / "events"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 10:00:00")
    now = _time.time()

    def write(name, rows, mtime):
        path = str(d / name)
        pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "ts": [base + pd.Timedelta(minutes=m) for m in rows],
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(path)
        os.utime(path, (mtime, mtime))  # distinct mtimes fix batch order

    # batch 1: events to 10:59 -> wm becomes 10:29 (30m delay) from batch 2 on
    write("b1.parquet", [0, 5, 59], now - 100)
    # batch 2: on-time row; the 10:00 window finalizes with 2 events
    write("b2.parquet", [58], now - 50)
    # batch 3: very-late row (10:01 < wm 10:29) + an on-time row
    write("b3.parquet", [1, 57], now)

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        tumbling_event_counts,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    from pyspark.sql import functions as F2

    stream = raw.withColumn("ts", F2.timestamp_micros(F2.expr("ts div 1000")))
    name = _run_to_memory(tumbling_event_counts(stream, "10 minutes", "30 minutes"), "append")
    rows = {r.window_start.minute: r.n_events for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # append mode emits only windows the watermark has closed: the 10:00-10:10
    # window must contain batch-1's two rows but NOT batch-2's late arrival
    assert rows.get(0) == 2


def test_stream_stream_time_bounded_join(spark, sf_dir, events_stream):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        correlate_event_pairs,
    )

    name = _run_to_memory(
        correlate_event_pairs(events_stream, "click", "purchase", "30 minutes"),
        "append",
    )
    got = {
        (r.user_id, r.first_event, r.then_event)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    e = load_table(spark, sf_dir, "events")
    a = e.filter("event_type = 'click'").select(
        F.col("user_id").alias("a_user"), F.col("event_id").alias("f"), F.col("ts").alias("a_ts")
    )
    b = e.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("b_user"), F.col("event_id").alias("t"), F.col("ts").alias("b_ts")
    )
    want = {
        (r.a_user, r.f, r.t)
        for r in a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    import os
    import time as _time

    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        dedup_events_stream,
    )

    d = tmp_path / "ev"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 10:00:00")
    now = _time.time()

    def write(name, ids, mtime):
        path = str(d / name)
        pd.DataFrame(
            {
                "event_id": ids,
                "ts": [base + pd.Timedelta(minutes=i) for i in range(len(ids))],
                "user_id": [1] * len(ids),
                "event_type": ["click"] * len(ids),
                "value": [1.0] * len(ids),
                "props": ["{}"] * len(ids),
            }
        ).to_parquet(path)
        os.utime(path, (mtime, mtime))

    write("b1.parquet", [1, 2, 2, 3], now - 50)  # intra-batch duplicate
    write("b2.parquet", [3, 4], now)  # cross-batch duplicate within watermark

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    name = _run_to_memory(dedup_events_stream(stream, ["event_id"]), "append")
    ids = sorted(r.event_id for r in spark.sql(f"SELECT * FROM {name}").collect())
    assert ids == [1, 2, 3, 4]


def test_incremental_summarize_stream(spark, tmp_path):
    import os
    import time as _time

    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        incremental_summarize_stream,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    now = _time.time()

    def write(name, rows, mtime):
        path = str(d / name)
        pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk"]).to_parquet(path)
        os.utime(path, (mtime, mtime))

    write("c1.parquet", [(1, 0, "alpha beta gamma delta"), (1, 1, "epsilon zeta")], now - 50)
    write("c2.parquet", [(1, 2, "eta theta"), (2, 0, "solo chunk")], now)

    stream = spark.readStream.schema("doc_id long, chunk_idx long, chunk string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d))
    out = incremental_summarize_stream(stream, MockSummarizer(3))
    name = _run_to_memory(out, "update")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # update mode: one row per doc per batch it appeared in; last state wins
    final = {}
    for r in rows:
        if r.doc_id not in final or r.n_chunks > final[r.doc_id][1]:
            final[r.doc_id] = (r.summary, r.n_chunks)
    # doc 1 folded 3 chunks across 2 batches; mock keeps first 3 tokens,
    # so the running summary stays the fold-prefix of chunk 0
    assert final[1][1] == 3
    assert final[1][0].split()[:3] == ["alpha", "beta", "gamma"]
    assert final[2] == ("solo chunk", 1)


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_incremental_summarize_idle_eviction(spark, tmp_path, provider):
    """idle_timeout_ms contract (event-time clock): a doc whose newest chunk
    falls idle_timeout behind the watermark is flushed once and its state
    dropped — a later chunk for the same doc restarts the fold from zero.
    That restart (n_chunks back to 1) is the observable proof the state store
    actually evicted, not merely went idle. Batches advance EVENT time, not
    wall clock, so the test is deterministic (no sleeps).

    The contract must hold verbatim on BOTH state store providers — RocksDB
    is the production choice at 100 TB, where per-partition state outgrows
    the default HDFS-backed in-memory provider's executor heap. The provider
    is picked up per-query at start, so a scoped conf set is enough; the
    rocksdb leg asserts rocksdb custom metrics in the query progress so a
    silent fallback to the default provider fails the test."""
    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        incremental_summarize_stream,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    t0 = pd.Timestamp("2024-01-01 10:00:00")

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk", "ts"]).to_parquet(
            str(d / name), coerce_timestamps="us"
        )

    write(
        "c1.parquet",
        [(1, 0, "alpha beta gamma delta", t0), (1, 1, "epsilon", t0)],
    )
    stream = spark.readStream.schema(
        "doc_id long, chunk_idx long, chunk string, ts timestamp"
    ).parquet(str(d))
    # 10-min idle window, 5-min watermark delay
    out = incremental_summarize_stream(
        stream,
        MockSummarizer(3),
        idle_timeout_ms=600_000,
        watermark="5 minutes",
    )
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(conf_key, None)
    if provider == "rocksdb":
        spark.conf.set(
            conf_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    name = "m" + uuid.uuid4().hex[:12]
    try:
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: doc 1 folds 2 chunks, deadline 10:10
            # batch 2 pushes the watermark to 10:55 > 10:10 → doc 1 evicts
            write("c2.parquet", [(2, 0, "solo chunk", t0 + pd.Timedelta(hours=1))])
            q.processAllAvailable()
            # batch 3: doc 1 returns post-eviction → fold restarts from scratch
            write("c3.parquet", [(1, 5, "restart chunk", t0 + pd.Timedelta(hours=2))])
            q.processAllAvailable()
            prog = q.lastProgress
            ops = prog["stateOperators"] if isinstance(prog, dict) else prog.stateOperators
            metrics = (
                ops[0]["customMetrics"] if isinstance(ops[0], dict) else ops[0].customMetrics
            )
        finally:
            q.stop()
    finally:
        if provider == "rocksdb":
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)

    if provider == "rocksdb":
        # the query really ran on RocksDB, not a silent fallback
        assert any(k.startswith("rocksdb") for k in metrics), metrics
    doc1 = sorted(
        (r.n_chunks, r.summary)
        for r in spark.sql(f"SELECT * FROM {name} WHERE doc_id = 1").collect()
    )
    # batch-1 update (n=2), timeout flush (n=2), post-eviction restart (n=1)
    assert [n for n, _ in doc1] == [1, 2, 2]
    # the restart row folded ONLY the new chunk — prior summary state is gone
    assert doc1[0][1] == "restart chunk"


def test_incremental_summarize_late_chunk_after_eviction_drops(spark, tmp_path):
    """Late-data corner of the eviction contract: once the watermark is set
    (idle_timeout_ms mode), FlatMapGroupsWithStateExec filters input rows
    below the watermark BEFORE the fold sees them — so a late chunk for an
    already-evicted doc is dropped outright, never resurrecting state or
    emitting a bogus 1-chunk summary. Only an ON-TIME chunk restarts the
    fold (pinned by the restart test); late ones vanish, consistent with
    every other watermarked operator's late-drop tests."""
    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        incremental_summarize_stream,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    t0 = pd.Timestamp("2024-01-01 10:00:00")

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk", "ts"]).to_parquet(
            str(d / name), coerce_timestamps="us"
        )

    write("c1.parquet", [(1, 0, "alpha beta gamma delta", t0)])
    stream = spark.readStream.schema(
        "doc_id long, chunk_idx long, chunk string, ts timestamp"
    ).parquet(str(d))
    out = incremental_summarize_stream(
        stream, MockSummarizer(3), idle_timeout_ms=600_000, watermark="5 minutes"
    )
    name = "m" + uuid.uuid4().hex[:12]
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: doc 1 folds, deadline 10:10
        # batch 2: watermark jumps to 11:55 → doc 1 evicts (flush)
        write("c2.parquet", [(2, 0, "solo", t0 + pd.Timedelta(hours=2))])
        q.processAllAvailable()
        # batch 3: LATE chunk for doc 1 at 10:20, far below the watermark
        write("c3.parquet", [(1, 9, "late chunk", t0 + pd.Timedelta(minutes=20))])
        q.processAllAvailable()
        # batch 4: fresh data advances the watermark again — if the late
        # chunk had resurrected doc 1's state, it would flush here
        write("c4.parquet", [(3, 0, "another", t0 + pd.Timedelta(hours=3))])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # doc 1: the batch-1 update and the eviction flush — nothing else
    assert sorted(
        (r.n_chunks, r.summary) for r in rows if r.doc_id == 1
    ) == [(1, "alpha beta gamma"), (1, "alpha beta gamma")]
    assert not any("late" in r.summary for r in rows), rows
    # batch 4 really ran (doc 3 present), so the absence above is a drop,
    # not an unprocessed batch
    assert any(r.doc_id == 3 for r in rows)


def test_incremental_summarize_out_of_order_chunk_keeps_deadline(spark, tmp_path):
    """The idle deadline is 'newest chunk EVER + idle' and must be MONOTONE:
    an out-of-order but on-time chunk (older than one already folded) must
    not pull the deadline backward and evict the doc early. Regression for
    the recompute-from-current-batch bug: state held only (summary, n), so
    batch 2's older chunk reset the deadline from newest-ever+idle to
    older+idle, and a watermark advance inside the contractual window
    flushed the doc and restarted the fold from zero."""
    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        incremental_summarize_stream,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    t = lambda s: pd.Timestamp(f"2024-01-01 {s}")  # noqa: E731

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk", "ts"]).to_parquet(
            str(d / name), coerce_timestamps="us"
        )

    # 10-min idle, 5-min watermark delay; doc 1's newest chunk is 10:30, so
    # the contractual eviction deadline is 10:40 for the whole test
    write("c1.parquet", [(1, 1, "beta", t("10:30:00"))])
    stream = spark.readStream.schema(
        "doc_id long, chunk_idx long, chunk string, ts timestamp"
    ).parquet(str(d))
    out = incremental_summarize_stream(
        stream, MockSummarizer(3), idle_timeout_ms=600_000, watermark="5 minutes"
    )
    name = "m" + uuid.uuid4().hex[:12]
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()  # wm -> 10:25; deadline 10:40
        # out-of-order but ON-TIME chunk (10:26 >= wm 10:25): must extend
        # nothing, and must NOT shrink the 10:40 deadline to 10:36
        write("c2.parquet", [(1, 0, "alpha", t("10:26:00"))])
        q.processAllAvailable()
        # advance the watermark to 10:38 — inside the contractual window
        # (10:38 < 10:40) but past the buggy recomputed deadline (10:36)
        write("c3.parquet", [(2, 0, "solo", t("10:43:00"))])
        q.processAllAvailable()  # wm -> 10:38 for the next batch
        write("c4.parquet", [(3, 0, "solo", t("10:44:00"))])
        q.processAllAvailable()  # buggy code evicts doc 1 here; fixed keeps it
        # a further on-time chunk inside the window must CONTINUE the fold
        write("c5.parquet", [(1, 2, "gamma", t("10:39:30"))])
        q.processAllAvailable()
    finally:
        q.stop()

    doc1 = sorted(
        (r.n_chunks, r.summary)
        for r in spark.sql(f"SELECT * FROM {name} WHERE doc_id = 1").collect()
    )
    # three update rows, no premature flush, no restart-from-zero:
    # buggy behavior yields [(1,'beta'), (1,'gamma'), (2,...), (2,...)]
    assert [n for n, _ in doc1] == [1, 2, 3]
    assert doc1[-1][1] == "beta alpha gamma"


def test_running_stats_out_of_order_event_keeps_deadline(spark, tmp_path):
    """Same monotone-deadline regression on the running-stats operator: an
    out-of-order on-time event must not shrink the user's idle-eviction
    deadline below newest-ever-event + idle (which would flush and fragment
    the running stats into two partial series)."""
    import pandas as pd

    d = tmp_path / "ev"
    d.mkdir()
    t = lambda s: pd.Timestamp(f"2024-01-01 {s}")  # noqa: E731

    def write(name, rows):
        pd.DataFrame(rows, columns=["user_id", "value", "ts"]).to_parquet(
            str(d / name), coerce_timestamps="us"
        )

    # 10-min idle, 5-min watermark delay; user 1's newest event is 12:00 →
    # contractual deadline 12:10
    write("e1.parquet", [(1, 10.0, t("12:00:00"))])
    stream = spark.readStream.schema(
        "user_id long, value double, ts timestamp"
    ).parquet(str(d))
    out = stateful_user_running_stats(
        stream, idle_timeout_ms=600_000, watermark="5 minutes"
    )
    name = "m" + uuid.uuid4().hex[:12]
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()  # wm -> 11:55
        write("e2.parquet", [(1, 5.0, t("11:56:00"))])  # on-time, out-of-order
        q.processAllAvailable()  # buggy deadline 12:06; contractual 12:10
        write("e3.parquet", [(2, 1.0, t("12:13:00"))])
        q.processAllAvailable()  # wm -> 12:08 for the next batch
        write("e4.parquet", [(3, 1.0, t("12:14:00"))])
        q.processAllAvailable()  # buggy code evicts user 1 at 12:08 < 12:10
        write("e5.parquet", [(1, 1.0, t("12:09:30"))])  # on-time continuation
        q.processAllAvailable()
    finally:
        q.stop()

    u1 = sorted(
        (r.n_events, r.total_value)
        for r in spark.sql(f"SELECT * FROM {name} WHERE user_id = 1").collect()
    )
    # one unbroken series — no flush row, no restart-from-zero
    assert u1 == [(1, 10.0), (2, 15.0), (3, 16.0)]


def test_notimeout_state_schema_stays_two_fields():
    """Checkpoint-compatibility guard: default-mode (NoTimeout) streams must
    keep the pre-newest_ms 2-field state schema — Spark rejects a widened
    schema on restart (STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE), so adding
    the idle-mode field unconditionally would break every existing
    default-mode checkpoint to carry a dead column."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        _running_stats_state_schema,
    )

    assert _running_stats_state_schema(None).fieldNames() == ["n", "total"]
    assert _running_stats_state_schema(600_000).fieldNames() == [
        "n",
        "total",
        "newest_ms",
    ]


def test_running_stats_idle_eviction(spark, tmp_path):
    """Same event-time idle-eviction contract on the running-stats operator:
    after the watermark-driven timeout flush, a returning user's stats
    restart from zero."""
    import pandas as pd

    d = tmp_path / "ev"
    d.mkdir()
    t0 = pd.Timestamp("2024-01-01 10:00:00")

    def write(name, rows):
        pd.DataFrame(rows, columns=["user_id", "value", "ts"]).to_parquet(
            str(d / name), coerce_timestamps="us"
        )

    write("e1.parquet", [(7, 10.0, t0), (7, 20.0, t0)])
    stream = spark.readStream.schema(
        "user_id long, value double, ts timestamp"
    ).parquet(str(d))
    out = stateful_user_running_stats(
        stream, idle_timeout_ms=600_000, watermark="5 minutes"
    )
    name = "m" + uuid.uuid4().hex[:12]
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        write("e2.parquet", [(8, 1.0, t0 + pd.Timedelta(hours=1))])
        q.processAllAvailable()  # watermark passes user 7's deadline → flush
        write("e3.parquet", [(7, 5.0, t0 + pd.Timedelta(hours=2))])
        q.processAllAvailable()  # user 7 restarts from zero
    finally:
        q.stop()

    u7 = sorted(
        (r.n_events, r.total_value)
        for r in spark.sql(f"SELECT * FROM {name} WHERE user_id = 7").collect()
    )
    assert u7 == [(1, 5.0), (2, 30.0), (2, 30.0)]


def test_incremental_summarize_recovers_state_from_checkpoint(spark, tmp_path):
    """Per-doc fold state must survive a query restart: run 1 folds two
    chunks and stops; run 2 starts from the same checkpoint with a third
    chunk and must produce n_chunks=3 with the summary continuing from the
    recovered prefix — the exactly-once contract a 1000-executor deploy
    leans on (any executor or driver can die mid-corpus)."""
    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        incremental_summarize_stream,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk"]).to_parquet(
            str(d / name)
        )

    def make_stream():
        stream = spark.readStream.schema(
            "doc_id long, chunk_idx long, chunk string"
        ).parquet(str(d))
        return incremental_summarize_stream(stream, MockSummarizer(3))

    write("c1.parquet", [(1, 0, "alpha beta gamma delta"), (1, 1, "epsilon")])
    q = (
        make_stream()
        .writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    write("c2.parquet", [(1, 2, "zeta eta")])
    rows = []
    q2 = (
        make_stream()
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    assert [(r.doc_id, r.n_chunks, r.summary) for r in rows] == [
        (1, 3, "alpha beta gamma")
    ]


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


def test_interval_join_stream_matches_batch(spark, sf_dir, events_stream):
    """Streaming twin of the events_click_in_purchase_window oracle query:
    every click inside the 30-minute window before a same-user purchase,
    run THROUGH the stream-stream bucketized interval join with watermarks
    on both sides. The batch operator (driver-green r5) is the anchor."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        interval_join,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        interval_join_stream,
    )

    def shape(ev):
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start_ts"),
            F.col("ts").alias("end_ts"),
        )
        return clicks, purchases

    s_clicks, s_purchases = shape(events_stream)
    name = _run_to_memory(
        interval_join_stream(
            s_clicks,
            s_purchases,
            bucket_seconds=1800,
            max_interval="30 minutes",
            on="user_id",
        ).select("user_id", "click_id", "purchase_id"),
        "append",
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    b_clicks, b_purchases = shape(load_table(spark, sf_dir, "events"))
    want = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in interval_join(
            b_clicks, b_purchases, bucket_seconds=1800, point_time="ts", on="user_id"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_interval_join_stream_drops_late_points(spark, tmp_path):
    """3-batch late-data contract (same protocol as
    test_watermark_drops_late_rows): the watermark computed from batch N
    becomes operative in batch N+1, so a click landing in batch 3 with an
    event time below the operative watermark is dropped even though a
    stored interval contains it — bounded state means late rows lose."""
    import os
    import time as _time

    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        interval_join_stream,
    )

    pdir = tmp_path / "points"
    idir = tmp_path / "intervals"
    pdir.mkdir()
    idir.mkdir()
    base = pd.Timestamp("2024-01-01 10:00:00")
    now = _time.time()

    def write_points(name, minutes, ids, mtime):
        path = str(pdir / name)
        pd.DataFrame(
            {
                "click_id": ids,
                "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
                "user_id": [1] * len(ids),
            }
        ).to_parquet(path)
        os.utime(path, (mtime, mtime))

    def write_intervals(name, rows, mtime):
        # rows: (purchase_id, start_min, end_min)
        path = str(idir / name)
        pd.DataFrame(
            {
                "purchase_id": [r[0] for r in rows],
                "start_ts": [base + pd.Timedelta(minutes=r[1]) for r in rows],
                "end_ts": [base + pd.Timedelta(minutes=r[2]) for r in rows],
                "user_id": [1] * len(rows),
            }
        ).to_parquet(path)
        os.utime(path, (mtime, mtime))

    # batch 1: interval A [10:00, 10:30) and a click at 10:05 (matches A);
    # a click at 11:59 + interval B [11:50, 12:05) advance both watermarks
    # to ~11:29 / ~11:20 (30m delay), operative from batch 2 on
    write_points("p1.parquet", [5, 119], [100, 101], now - 100)
    write_intervals("i1.parquet", [(200, 0, 30), (201, 110, 125)], now - 100)
    # batch 2: an on-time click at 118 min (matches B). The now-operative
    # watermark lets the join evict interval A's state this batch (no
    # point <= A.start + 30min can still arrive).
    write_points("p2.parquet", [118], [103], now - 50)
    # batch 3: a LATE click at 10:10 — interval A contains it, but A's
    # state is gone and the row is below the operative watermark
    write_points("p3.parquet", [10], [102], now)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    points = (
        spark.readStream.schema("click_id long, ts long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(pdir))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    intervals = (
        spark.readStream.schema(
            "purchase_id long, start_ts long, end_ts long, user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(idir))
        .withColumn("start_ts", F.timestamp_micros(F.expr("start_ts div 1000")))
        .withColumn("end_ts", F.timestamp_micros(F.expr("end_ts div 1000")))
    )
    name = _run_to_memory(
        interval_join_stream(
            points,
            intervals,
            bucket_seconds=600,
            max_interval="30 minutes",
            on="user_id",
            point_watermark="30 minutes",
            interval_watermark="30 minutes",
        ).select("click_id", "purchase_id"),
        "append",
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # on-time matches arrive; the late click 102 never pairs with A (200)
    assert (100, 200) in got
    assert (103, 201) in got
    assert not any(c == 102 for c, _ in got), got


def test_interval_join_stream_recovers_buffered_state(spark, tmp_path):
    """Join-buffer durability: run 1 ingests ONLY an interval and stops; run
    2 restarts from the same checkpoint and ingests a click inside that
    interval. The pair can only be emitted if the interval's buffered join
    state was recovered from the checkpoint — completing the durability
    story alongside the per-doc fold recovery test."""
    import pandas as pd

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        interval_join_stream,
    )

    pdir = tmp_path / "points"
    idir = tmp_path / "intervals"
    pdir.mkdir()
    idir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    base = pd.Timestamp("2024-01-01 10:00:00")

    def make_join():
        points = spark.readStream.schema(
            "click_id long, ts timestamp, user_id long"
        ).parquet(str(pdir))
        intervals = spark.readStream.schema(
            "purchase_id long, start_ts timestamp, end_ts timestamp, user_id long"
        ).parquet(str(idir))
        return interval_join_stream(
            points,
            intervals,
            bucket_seconds=600,
            max_interval="30 minutes",
            on="user_id",
            point_watermark="30 minutes",
            interval_watermark="30 minutes",
        ).select("click_id", "purchase_id")

    # run 1: interval A [10:00, 10:30) only — no points yet
    pd.DataFrame(
        {
            "purchase_id": [200],
            "start_ts": [base],
            "end_ts": [base + pd.Timedelta(minutes=30)],
            "user_id": [1],
        }
    ).to_parquet(str(idir / "i1.parquet"), coerce_timestamps="us")
    q = (
        make_join()
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # run 2: a click inside A arrives after the restart
    pd.DataFrame(
        {
            "click_id": [100],
            "ts": [base + pd.Timedelta(minutes=5)],
            "user_id": [1],
        }
    ).to_parquet(str(pdir / "p1.parquet"), coerce_timestamps="us")
    rows = []
    q2 = (
        make_join()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    assert [(r.click_id, r.purchase_id) for r in rows] == [(100, 200)]


def test_interval_join_stream_plan_is_symmetric_hash_join(spark, events_stream):
    """The bucket column must hand the stream-stream join its equality key:
    the physical plan is StreamingSymmetricHashJoin fed by one exchange per
    side — never a nested-loop fallback (which would mean the range
    predicate reached the planner without the bucket equi-key and state
    could not be keyed)."""
    import pyspark

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
        interval_join_stream,
    )

    clicks = events_stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = events_stream.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    out = interval_join_stream(
        clicks, purchases, 1800, "30 minutes", on="user_id"
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    if pyspark.__version__.split(".")[:2] == ["4", "1"]:
        assert "StreamingSymmetricHashJoin" in plan, plan
