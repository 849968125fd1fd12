"""Opportunistic state-v2 (`transformWithStateInPandas`) seam.

Spark 4.1 ships the GA successor to `applyInPandasWithState` —
`transformWithStateInPandas` with typed state variables, timers, and
built-in TTL — but its Python state-server protocol imports
`google.protobuf`, which is absent in this sandbox (probed round 7: the
TransformWithState driver worker crashes with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``
during ``validateAndMaybeEvolveStateSchema``, before the first batch).
The engine's stateful operators therefore stay on
`applyInPandasWithState` (fully supported, fully tested — see
`streaming/events.py`), and this test pins the state-v2 twin of the
per-doc summarize fold so it runs the day the dependency appears —
the same honest seam as `tests/test_real_models_optional.py`.
"""

import uuid

import pytest


def test_summarize_fold_on_transform_with_state(spark, tmp_path):
    """State-v2 twin of incremental_summarize_stream's eviction contract:
    ValueState + an event-time timer re-registered on every batch, flush +
    clear on expiry, restart-from-zero on return. Must match the
    applyInPandasWithState operator's observable rows exactly."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf for its state "
        "server; absent in this sandbox",
    )
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )

    summarizer = MockSummarizer(3)
    idle_ms = 600_000

    class SummarizeProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            # deadline rides in the state so a superseded timer can be
            # deleted on the next batch (one live timer per doc)
            self.state = handle.getValueState(
                "fold", "summary string, n_chunks bigint, deadline_ms bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self.state.exists():
                summary, n, old_deadline = self.state.get()
            else:
                summary, n, old_deadline = "", 0, None
            pdf = pd.concat(list(rows), ignore_index=True)
            for chunk in pdf.sort_values("chunk_idx")["chunk"]:
                summary = (
                    summarizer.summarize_text(chunk)
                    if not summary
                    else summarizer.summarize_text(summary + "\n\n" + chunk)
                )
                n += 1
            newest_ms = int(pdf["ts"].max().value // 1_000_000)
            # max with the stored deadline: monotone under out-of-order
            # on-time chunks, same contract as the applyInPandasWithState
            # operator (which carries newest_ms in its state schema)
            deadline = max(
                newest_ms + idle_ms,
                old_deadline if old_deadline is not None else -1,
                timerValues.getCurrentWatermarkInMs() + 1,
            )
            if old_deadline is not None and old_deadline != deadline:
                self.handle.deleteTimer(old_deadline)
            if old_deadline != deadline:
                self.handle.registerTimer(deadline)
            self.state.update((summary, n, deadline))
            yield pd.DataFrame(
                {"doc_id": [key[0]], "summary": [summary], "n_chunks": [n]}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self.state.exists():
                summary, n, _deadline = self.state.get()
                self.state.clear()
                yield pd.DataFrame(
                    {"doc_id": [key[0]], "summary": [summary], "n_chunks": [n]}
                )

        def close(self):
            pass

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
    out = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy("doc_id")
        .transformWithStateInPandas(
            statefulProcessor=SummarizeProcessor(),
            outputStructType=T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("summary", T.StringType()),
                    T.StructField("n_chunks", T.LongType()),
                ]
            ),
            outputMode="Update",
            timeMode="EventTime",
        )
    )

    # state-v2 requires the RocksDB provider
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
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
            q.processAllAvailable()
            write("c2.parquet", [(2, 0, "solo chunk", t0 + pd.Timedelta(hours=1))])
            q.processAllAvailable()
            write("c3.parquet", [(1, 5, "restart chunk", t0 + pd.Timedelta(hours=2))])
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)

    doc1 = sorted(
        (r.n_chunks, r.summary)
        for r in spark.sql(f"SELECT * FROM {name} WHERE doc_id = 1").collect()
    )
    # identical to the applyInPandasWithState eviction contract:
    # batch-1 update (n=2), timer flush (n=2), post-eviction restart (n=1)
    assert [n for n, _ in doc1] == [1, 2, 2]
    assert doc1[0][1] == "restart chunk"
