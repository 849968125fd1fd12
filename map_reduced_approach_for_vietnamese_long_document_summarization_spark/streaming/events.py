"""Streaming operators over the events table.

The reference is batch-only (SURVEY §2.10) — this is the Structured
Streaming surface the north star mandates: watermarked tumbling/sliding
windows, session windows, and a custom stateful operator
(``applyInPandasWithState``), the incremental analog of the reference's
ordered fold (D11).

Every transformation here is source-agnostic: tests drive them with the
file source over the harness parquet (one batch, ``availableNow``); in
production the same code binds to Kafka. Batch/stream parity is by
construction — the same ``window``/``session_window`` expressions back the
batch oracle queries in ``plans.relational``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

# physical schema of events.parquet (ts is int64 nanos on disk — see
# sources.tables for the batch-side handling)
_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table with event-time ``ts``.

    ``maxFilesPerTrigger`` keeps micro-batches bounded when pointed at a
    directory of rolling files; for the single harness file it is one batch.
    The file source requires a directory — ``sf_dir`` is the table directory,
    filtered to the events file.
    """
    from ..sources.tables import ensure_semantic_confs

    ensure_semantic_confs(spark)  # pin UTC etc. — same contract as load_table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The harness has shipped `ts` both as TIMESTAMP(NANOS) (read as bigint
    # under nanosAsLong) and as plain µs TIMESTAMP (LTZ or NTZ). A stream
    # needs its schema up front, so probe the parquet footer via the batch
    # reader (metadata only, no data scan). Non-bigint ts is declared LTZ —
    # watermarks reject NTZ event time — which reinterprets NTZ wall-clock
    # via the session timezone; that is exact because ensure_semantic_confs
    # above pins the session to UTC (the same reason load_table pins it).
    probed = {f.name: f.dataType for f in spark.read.parquet(f"{sf_dir}/events.parquet").schema}
    is_ns_bigint = isinstance(probed.get("ts"), T.LongType)
    schema = T.StructType(
        [
            f if f.name != "ts" or is_ns_bigint else T.StructField("ts", T.TimestampType())
            for f in _EVENTS_RAW.fields
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if is_ns_bigint:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_event_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type; late rows beyond
    the watermark are dropped, state for closed windows is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in window/slide panes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_event_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows per user (dynamic gap-merged), the streaming twin of
    the batch ``events_sessionization`` oracle query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame, key_map: dict[str, str]) -> DataFrame:
    """Stream-static join: enrich the event stream against a (slowly
    changing) dimension table. The static side broadcasts per micro-batch,
    so the stream never shuffles — the standard dimension-enrichment shape.

    ``key_map`` maps stream column -> dim column, e.g. {"user_id": "c_custkey"}.
    """
    from pyspark.sql import functions as _F

    cond = None
    for sk, dk in key_map.items():
        c = events[sk] == dim[dk]
        cond = c if cond is None else (cond & c)
    return events.join(_F.broadcast(dim), cond, "left")


def dedup_events_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: drop duplicate events by key, keeping state
    only within the watermark horizon (``dropDuplicatesWithinWatermark``),
    so at-least-once sources (Kafka redeliveries) don't double-count and
    state stays bounded — the streaming twin of operators.dedup.exact_dedup."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def _monotone_deadline(
    prev_newest_ms: int, batch_max_ms: int, idle_ms: int, wm_ms: int
) -> tuple[int, int]:
    """Shared idle-eviction deadline rule for the stateful operators: return
    ``(newest_ms, deadline_ms)`` where ``newest_ms`` is the newest event time
    EVER seen for the key and the deadline is ``newest_ms + idle_ms``.

    The fold over ``prev_newest_ms`` (carried in the operator's state row)
    is what makes the deadline MONOTONE: recomputing it from only the
    current batch's max would let an out-of-order but on-time event (older
    than one already processed) pull the deadline BACKWARD and evict the key
    inside its contractual "newest + idle" window — flushing a partial
    result and restarting the fold from zero. The newest-ever time must ride
    in the state schema because ``GroupState.oldTimeoutTimestamp`` cannot
    substitute: the applyInPandasWithState exec never ships the persisted
    timeout timestamp to Python (it reads NO_TIMESTAMP every batch; probed
    empirically on Spark 4.1). Clamped to the operative watermark because
    Spark rejects deadlines at or behind it — a key fed only data at the
    watermark boundary is already idle and evicts at the next advance.
    Pinned by the two ``*_keeps_deadline`` regression tests."""
    newest_ms = max(prev_newest_ms, batch_max_ms)
    return newest_ms, max(newest_ms + idle_ms, wm_ms + 1)


def incremental_summarize_stream(
    chunks: DataFrame,
    summarizer,
    id_col: str = "doc_id",
    idle_timeout_ms: int | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful incremental summarization — the streaming analog of the
    iterative-refinement fold (SURVEY §2.10 / D11): as a document's chunks
    arrive across micro-batches, per-doc state carries the running summary
    and each batch refines it with the new chunks (in chunk_idx order).

    Output (update mode): one row per doc per batch with the current summary
    and the number of chunks folded so far.

    ``idle_timeout_ms`` is the production state bound: with per-doc state and
    an unbounded corpus, NoTimeout state grows with the number of distinct
    docs ever seen. When set, ``ts_col`` (the chunk's event time) must exist;
    a doc whose newest chunk falls ``idle_timeout_ms`` behind the stream's
    watermark gets one final row (its finished summary) and its state is
    evicted, so the state store holds only in-flight docs. A doc whose chunks
    resume ON TIME after eviction restarts the fold from scratch — the same
    contract as the nightly composition's fingerprint gate (re-process, don't
    corrupt) — while LATE chunks (event time below the watermark) are
    filtered before the fold ever sees them and can neither resurrect evicted
    state nor emit a partial summary (pinned by the late-chunk drop test).

    Idleness is measured on the EVENT-TIME clock (``EventTimeTimeout``), not
    wall clock: eviction is then a pure function of the data, so a checkpoint
    replay reproduces the exact same flush rows, and — operationally — a
    processing-time timeout makes ``FlatMapGroupsWithStateExec.
    shouldRunAnotherBatch`` always true, so the stream schedules empty
    micro-batches forever and ``processAllAvailable()`` never returns (the
    same reason the late-drop tests drive event time forward instead of
    sleeping).
    """
    id_type = chunks.schema[id_col].dataType  # honor string/long doc ids
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("summary", T.StringType()),
            T.StructField("n_chunks", T.LongType()),
        ]
    )
    # In idle mode the state additionally carries the newest chunk event
    # time EVER folded (see _monotone_deadline). The field is added ONLY in
    # idle mode so default-mode (NoTimeout) queries keep their existing
    # 2-field checkpoints. MIGRATION: a query that turns idle_timeout_ms on
    # (or a pre-newest_ms idle checkpoint upgrading to this version) widens
    # its state schema, which Spark's state schema checker rejects on
    # restart (STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE) — start such a
    # stream from a fresh checkpoint. state_schema_migration_hint()
    # recognizes that failure and returns this instruction for callers to
    # surface (the error is async, so it cannot be caught here).
    state_fields = [
        T.StructField("summary", T.StringType()),
        T.StructField("n_chunks", T.LongType()),
    ]
    if idle_timeout_ms is not None:
        state_fields.append(T.StructField("newest_ms", T.LongType()))
    state_schema = T.StructType(state_fields)

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle eviction: flush the finished summary once, drop the state
            summary, n = state.get[0], state.get[1]
            state.remove()
            yield pd.DataFrame(
                {id_col: [key[0]], "summary": [summary], "n_chunks": [n]}
            )
            return
        if state.exists:
            summary, n = state.get[0], state.get[1]
            newest_ms = state.get[2] if idle_timeout_ms is not None else -1
        else:
            summary, n, newest_ms = "", 0, -1
        # a micro-batch may arrive as several Arrow batches: concatenate and
        # sort ONCE so the fold respects chunk_idx across batch boundaries
        all_pdf = pd.concat(list(pdfs), ignore_index=True)
        for chunk in all_pdf.sort_values("chunk_idx")["chunk"]:
            summary = (
                summarizer.summarize_text(chunk)
                if not summary
                else summarizer.summarize_text(summary + "\n\n" + chunk)
            )
            n += 1
        if idle_timeout_ms is not None:
            newest_ms, deadline = _monotone_deadline(
                newest_ms,
                int(all_pdf[ts_col].max().value // 1_000_000),
                idle_timeout_ms,
                state.getCurrentWatermarkMs(),
            )
            state.update((summary, n, newest_ms))
            state.setTimeoutTimestamp(deadline)
        else:
            state.update((summary, n))
        yield pd.DataFrame({id_col: [key[0]], "summary": [summary], "n_chunks": [n]})

    if idle_timeout_ms is not None:
        src = chunks.withWatermark(ts_col, watermark).select(
            id_col, "chunk_idx", "chunk", ts_col
        )
    else:
        src = chunks.select(id_col, "chunk_idx", "chunk")
    return src.groupBy(id_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            "EventTimeTimeout" if idle_timeout_ms is not None else "NoTimeout"
        ),
    )


def state_schema_migration_hint(exc: BaseException) -> str | None:
    """Recognize the idle-mode state-schema widening rejection and return
    the migration instruction, else None.

    ``incremental_summarize_stream(idle_timeout_ms=...)`` widens the state
    value schema with ``newest_ms`` (see its docstring); restarting a
    checkpoint written by the 2-field (pre-idle) version then fails with
    Spark's ``STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE``. Streaming errors
    surface asynchronously (``StreamingQueryException`` from ``awaitTermination``
    / ``processAllAvailable``), so the construction site cannot catch this —
    callers run their start/await under ``try`` and ask this helper::

        try:
            q.processAllAvailable()
        except Exception as e:
            hint = state_schema_migration_hint(e)
            if hint: raise RuntimeError(hint) from e
            raise

    Walks the ``__cause__`` chain so wrapped Py4J/connect exceptions match
    too."""
    seen = set()
    cur: BaseException | None = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        msg = str(cur)
        if (
            "STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE" in msg
            or "StateSchemaNotCompatible" in msg
        ):
            return (
                "State value schema changed under this checkpoint: "
                "incremental_summarize_stream's idle mode (idle_timeout_ms) "
                "stores an extra newest_ms field, which is incompatible with "
                "checkpoints written before idle mode was enabled (and vice "
                "versa). Spark state schemas cannot be migrated in place — "
                "start the stream from a FRESH checkpointLocation (the "
                "evicted docs re-process from the source on replay; the "
                "fingerprint-gate contract makes that re-processing, not "
                "corruption)."
            )
        cur = cur.__cause__
    return None


def correlate_event_pairs(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream self-join with an event-time range condition: for each
    ``first_type`` event, the same user's ``then_type`` events within
    ``within`` afterwards. Watermarks on both sides + the time-range bound
    let Spark size and evict the join state — without them a stream-stream
    join would buffer forever."""
    a = (
        events.filter(F.col("event_type") == first_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("first_event"),
            F.col("ts").alias("a_ts"),
        )
    )
    b = (
        events.filter(F.col("event_type") == then_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("then_event"),
            F.col("ts").alias("b_ts"),
        )
    )
    cond = (
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {within}"))
    )
    return a.join(b, cond).select(
        F.col("a_user").alias("user_id"), "first_event", "then_event"
    )


def interval_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    bucket_seconds: int,
    max_interval: str,
    point_time: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    on: str | None = None,
    point_watermark: str = "1 hour",
    interval_watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``operators.interval.interval_join`` — the same
    bucketization, run as a stream-stream join with watermarks on both
    sides so the join state is bounded and late rows drop.

    The bucket column does double duty here: in batch it turns the range
    predicate into a hash equi-join; in streaming it ALSO hands
    StreamingSymmetricHashJoin its equality key, so the state store is
    partitioned by (key, bucket) instead of the planner rejecting a pure
    range condition. ``max_interval`` is the streaming-only contract: every
    interval must satisfy ``end - start <= max_interval`` (the explicit
    ``point_time <= start + max_interval`` bound is what lets Spark compute
    state-eviction thresholds from the two watermarks — unbounded intervals
    would mean unbounded state). For bounded intervals the bound is implied
    by ``point_time < end`` and results equal the batch operator's exactly;
    longer intervals lose matches beyond the bound, by contract.

    Semantics are otherwise the batch operator's: half-open containment
    ``start <= t < end``, optional equality key ``on``, both payloads ride
    through; the key column appears once in the output (the point side's —
    the interval side's copy is equal by the join condition and dropped).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    clash = (set(points.columns) & set(intervals.columns)) - ({on} if on else set())
    if clash:
        raise ValueError(f"rename clashing payload columns first: {sorted(clash)}")
    reserved = {"_pb", "_ib", "_ikey"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(
            f"interval_join_stream reserves {sorted(reserved)}; rename first"
        )

    def secs(c):
        return F.col(c).cast("timestamp").cast("double")

    w = F.lit(float(bucket_seconds))
    p = points.withWatermark(point_time, point_watermark).withColumn(
        "_pb", F.floor(secs(point_time) / w)
    )
    iv = intervals.withWatermark(start, interval_watermark)
    if on is not None:
        iv = iv.withColumnRenamed(on, "_ikey")
    iv = iv.withColumn(
        "_ib",
        F.explode(F.sequence(F.floor(secs(start) / w), F.floor(secs(end) / w))),
    )
    cond = (
        (F.col("_pb") == F.col("_ib"))
        & (F.col(start) <= F.col(point_time))
        & (F.col(point_time) < F.col(end))
        # state-eviction bound: ties the two watermarked columns together
        & (F.col(point_time) <= F.col(start) + F.expr(f"INTERVAL {max_interval}"))
    )
    if on is not None:
        cond = cond & (F.col(on) == F.col("_ikey"))
    return p.join(iv, cond).drop("_pb", "_ib", "_ikey")


def _running_stats_state_schema(idle_timeout_ms: int | None) -> T.StructType:
    fields = [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
    if idle_timeout_ms is not None:
        # newest event time EVER seen (epoch ms) — state-carried so the idle
        # deadline is monotone (see _monotone_deadline). Only added in idle
        # mode so NoTimeout checkpoints keep the 2-field schema; turning the
        # timeout on requires a fresh checkpoint.
        fields.append(T.StructField("newest_ms", T.LongType()))
    return T.StructType(fields)
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("avg_value", T.DoubleType()),
    ]
)


def _make_running_stats_fn(idle_timeout_ms: int | None):
    def _running_stats_fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Custom stateful operator: running per-user count/sum/avg across
        micro-batches — state survives between triggers (the incremental
        analog of the reference's refine fold)."""
        if state.hasTimedOut:
            n, total = state.get[0], state.get[1]
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "avg_value": [total / n if n else 0.0],
                }
            )
            return
        if state.exists:
            n, total = state.get[0], state.get[1]
            newest_ms = state.get[2] if idle_timeout_ms is not None else -1
        else:
            n, total, newest_ms = 0, 0.0, -1
        batch_max_ms = -1
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if idle_timeout_ms is not None:
                batch_max_ms = max(
                    batch_max_ms, int(pdf["ts"].max().value // 1_000_000)
                )
        if idle_timeout_ms is not None:
            # event-time idleness: evict when the watermark passes the user's
            # newest-EVER event + idle window (monotone — _monotone_deadline)
            newest_ms, deadline = _monotone_deadline(
                newest_ms, batch_max_ms, idle_timeout_ms,
                state.getCurrentWatermarkMs(),
            )
            state.update((n, total, newest_ms))
            state.setTimeoutTimestamp(deadline)
        else:
            state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "avg_value": [total / n if n else 0.0],
            }
        )

    return _running_stats_fn


def stateful_user_running_stats(
    events: DataFrame,
    idle_timeout_ms: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """applyInPandasWithState: per-user running statistics with explicit
    state schema. Default is no timeout (state lives for the stream's
    lifetime — fine for a bounded user universe); ``idle_timeout_ms`` turns
    on event-time idle eviction so at 100 TB (unbounded user ids) the state
    store holds only recently-active users: a user whose newest event falls
    ``idle_timeout_ms`` behind the watermark gets one final stats row and its
    state dropped, and a later event for that user restarts its running stats
    from zero. Event time, not wall clock, so eviction replays
    deterministically from a checkpoint (rationale in
    ``incremental_summarize_stream``)."""
    if idle_timeout_ms is not None:
        src = events.withWatermark("ts", watermark).select("user_id", "value", "ts")
    else:
        src = events.select("user_id", "value")
    return src.groupBy("user_id").applyInPandasWithState(
        _make_running_stats_fn(idle_timeout_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_running_stats_state_schema(idle_timeout_ms),
        outputMode="update",
        timeoutConf=(
            "EventTimeTimeout" if idle_timeout_ms is not None else "NoTimeout"
        ),
    )
