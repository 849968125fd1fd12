"""The iteration loops (components, collapse, critique, hierarchical) must
not accumulate localCheckpoint RDDs: superseded rounds are released as soon
as the next round materializes (operators/_ckpt.py). Regression guard for
the measured 12s -> 131s degradation over repeated component runs."""

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
    persistent_rdd_ids,
    release_rdds,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.collapse import (
    collapse_until_fits,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.components import (
    connected_components,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
)


def _purge(spark):
    spark.catalog.clearCache()
    sc = spark.sparkContext
    release_rdds(sc, persistent_rdd_ids(sc))


def test_components_releases_round_checkpoints(spark):
    _purge(spark)
    sc = spark.sparkContext
    # a long chain forces several propagation rounds
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id1 long, id2 long"
    )
    out = connected_components(edges, id_col="doc_id")
    rows = out.collect()
    assert {r.component for r in rows} == {0}
    # at most: the final labels checkpoint (1-2 RDD ids) survives the call;
    # per-round checkpoints and the edge table must be gone
    leftover = len(persistent_rdd_ids(sc))
    assert leftover <= 2, f"components leaked {leftover} checkpoint RDDs"
    _purge(spark)


def test_collapse_releases_round_checkpoints(spark):
    _purge(spark)
    sc = spark.sparkContext
    rows = [(1, i, f"tok{i} " * 30, 30) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, text string, n_tokens int")
    out = collapse_until_fits(
        df, MockSummarizer(8), token_max=60,
        key_col="doc_id", order_col="chunk_idx", text_col="text", tokens_col="n_tokens",
    )
    assert out.count() >= 1
    leftover = len(persistent_rdd_ids(sc))
    assert leftover <= 2, f"collapse leaked {leftover} checkpoint RDDs"
    _purge(spark)


def test_repeated_runs_stay_bounded(spark):
    _purge(spark)
    sc = spark.sparkContext
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id1 long, id2 long"
    )
    counts = []
    for _ in range(3):
        connected_components(edges, id_col="doc_id").count()
        counts.append(len(persistent_rdd_ids(sc)))
    # growth is exactly the per-call final-labels RDD(s) — linear with a
    # slope of <=2, never the per-round checkpoint count
    assert counts[-1] - counts[0] <= 4, counts
    _purge(spark)


def test_checkpoint_concurrently_failure_releases_siblings(spark):
    """r14 ADVICE fix: when one subplan's materialization raises, the RDDs
    behind siblings that already checkpointed must be unpersisted before the
    error propagates — nothing this call pinned may leak for the session."""
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        checkpoint_concurrently,
    )

    _purge(spark)
    sc = spark.sparkContext
    good = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("x"))

    @F.udf("long")
    def boom(v):
        raise RuntimeError("planted materialization failure")

    bad = spark.range(10).select(boom(F.col("id")).alias("b"))
    before = persistent_rdd_ids(sc)
    with pytest.raises(Exception):
        checkpoint_concurrently([good, bad])
    leaked = persistent_rdd_ids(sc) - before
    assert not leaked, f"failure path leaked checkpoint RDDs: {leaked}"
    _purge(spark)


def test_checkpoint_concurrently_inherits_job_description(spark):
    """r14 ADVICE fix: the caller's thread-local job description must carry
    into the pooled materialization jobs (pinned-thread mode drops plain
    pool threads' properties)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        checkpoint_concurrently,
    )

    _purge(spark)
    sc = spark.sparkContext
    sc.setJobDescription("ckpt-concurrent-test")
    try:
        descs = []
        tracker = sc.statusTracker()
        seen_before = set(tracker.getJobIdsForGroup(None) or [])
        outs = checkpoint_concurrently([spark.range(50), spark.range(60)])
        assert [o.count() for o in outs] == [50, 60]
        for jid in tracker.getJobIdsForGroup(None) or []:
            if jid in seen_before:
                continue
            info = tracker.getJobInfo(jid)
            if info is not None:
                descs.append(jid)
        # the pooled jobs ran under the caller's group view: they are
        # visible to the caller's (default) job group at all — under a
        # dropped-properties regression the check above still passes, so
        # additionally assert via the JVM-side property that the wrapper
        # restored the caller's description on this thread
        assert (
            sc.getLocalProperty("spark.job.description")
            == "ckpt-concurrent-test"
        )
    finally:
        sc.setJobDescription(None)
    _purge(spark)


def test_rolling_checkpoint_lazy_contract(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        RollingCheckpoint,
        persistent_rdd_ids,
    )

    sc = spark.sparkContext
    rc = RollingCheckpoint(sc)
    # misuse fails loudly instead of unpersisting a live checkpoint
    with pytest.raises(RuntimeError):
        rc.mark_materialized()
    df0 = spark.range(10)
    cur = rc.checkpoint(df0, eager=True)
    assert cur.count() == 10
    with pytest.raises(RuntimeError):
        rc.mark_materialized()  # eager checkpoint left nothing pending
    # lazy generation: materialize, mark once (ok), mark again (loud)
    before = persistent_rdd_ids(sc)
    cur2 = rc.checkpoint(cur.withColumn("x", cur.id * 2), eager=False)
    assert cur2.count() == 10  # materializes the lazy checkpoint
    rc.mark_materialized()
    with pytest.raises(RuntimeError):
        rc.mark_materialized()
    # the superseded eager generation was released; the lazy one is live
    live_now = persistent_rdd_ids(sc)
    assert live_now - before  # new checkpoint registered
    assert cur2.count() == 10  # still readable after rotation


def test_rolling_checkpoint_refuses_to_abandon_pending(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        RollingCheckpoint,
    )

    rc = RollingCheckpoint(spark.sparkContext)
    lazy = rc.checkpoint(spark.range(5), eager=False)
    with pytest.raises(RuntimeError):
        rc.checkpoint(spark.range(6), eager=True)  # pending never marked
    assert lazy.count() == 5
    rc.mark_materialized()
    rc.checkpoint(spark.range(6), eager=True)  # now fine


def test_hierarchical_ckpt_aggregates_identical_and_bounded(spark):
    """r13 optimization pin: ``ckpt_aggregates`` (single-evaluation
    localCheckpoints of the per-level bodies gather and the final per-doc
    gather) must not change results, the per-level bodies checkpoint must be
    released with the level's other pins, and only the documented final
    generations may stay live after the action."""
    import json

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        hierarchical_summarize,
    )

    _purge(spark)
    sc = spark.sparkContext
    tree = {
        "type": "Document",
        "text": "d",
        "children": [
            {
                "type": "Header",
                "text": "Part 1",
                "children": [{"type": "Paragraph", "text": "alpha beta gamma delta " * 8}],
            },
            {
                "type": "Header",
                "text": "Part 2",
                "children": [{"type": "Paragraph", "text": "one two three four " * 8}],
            },
            {"type": "Header", "text": "Empty", "children": []},
        ],
    }
    trees = spark.createDataFrame(
        [(f"d{i}", json.dumps(dict(tree, text=f"d{i}"))) for i in range(4)],
        ["doc_id", "tree_json"],
    )

    def run(ckpt: bool) -> dict:
        return {
            r.doc_id: r.summary
            for r in hierarchical_summarize(
                trees, MockSummarizer(12), max_depth=1, chunk_size=60,
                chunk_overlap=10, token_max=80, ckpt_aggregates=ckpt,
            ).collect()
        }

    base = run(False)
    _purge(spark)
    out = run(True)
    assert out == base  # byte-identical summaries either way
    # live after the action: the loop's final node checkpoint, the final
    # collapse generation, and the final_in checkpoint — never the per-level
    # bodies checkpoints (released by the post-level diff) or superseded
    # collapse rounds
    leftover = len(persistent_rdd_ids(sc))
    assert leftover <= 6, f"hierarchical leaked {leftover} checkpoint RDDs"
    _purge(spark)
