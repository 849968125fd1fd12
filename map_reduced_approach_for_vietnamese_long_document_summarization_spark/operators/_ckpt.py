"""Checkpoint lifecycle helpers for bounded driver-side iteration loops.

``localCheckpoint`` persists the materialized RDD but registers nothing a
later ``spark.catalog.clearCache()`` can release, so every round of an
iterative loop (collapse, critique, hierarchical levels, connected
components) would otherwise pin one superseded RDD in executor memory for
the life of the session — measured as a 12s -> 131s degradation over
repeated component runs. These helpers release a round's checkpoint the
moment the next round's checkpoint has materialized (at which point the old
data can never be read again: every downstream plan reads the NEW
checkpoint).
"""

from __future__ import annotations


def persistent_rdd_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def release_rdds(sc, ids: set[int], blocking: bool = False) -> None:
    """Unpersist checkpoint RDDs by id. localCheckpoint truncates lineage,
    so this is only safe once every plan that read them has materialized —
    which is exactly when a round's new checkpoint supersedes the old.
    The before/after id-diffs that feed this assume no OTHER thread is
    persisting RDDs on the same SparkContext during the snapshot window;
    the worst case (a foreign cached RDD unpersisted early) costs a
    recompute, never correctness — except for foreign localCheckpoints,
    which share this function's one-materialization caveat.

    ``blocking=False`` (default) dispatches eviction asynchronously — right
    for operator loops, where cleanup overlaps the next round's compute.
    Measurement tools (bench/probe/scaling) pass ``True`` so eviction work
    from the previous query cannot bleed into the next timed region."""
    jmap = sc._jsc.getPersistentRDDs()
    for k in ids:
        rdd = jmap.get(k)
        if rdd is not None:
            rdd.unpersist(blocking)


def checkpoint_concurrently(dfs, max_workers: int = 4):
    """Materialize INDEPENDENT DataFrames as eager ``localCheckpoint``s from
    a small driver thread pool, returning them in input order.

    Spark only serializes actions because driver code calls them
    sequentially (guide §2.6 "overlap independent jobs"): a composite plan
    whose subtrees share no data still executes its AQE stage chains one
    after another when materialized by one driver thread, leaving most of
    the cluster idle during each chain's single-task stages and driver-side
    tails. Submitting each subplan's materialization from its own thread
    lets the scheduler back-fill those gaps — measured 5.98s -> 3.65s on
    ann_recall_at3's three ANN subplans (OPTIMIZATION_r13.md, interleaved
    same-session A/B, results bit-identical).

    Use ONLY for subplans that share no persisted/checkpointed state being
    concurrently created elsewhere: ``release_rdds`` id-diff bookkeeping
    assumes single-threaded snapshots, so callers must let this function
    RETURN before taking persistent-RDD snapshots (the pool is joined here,
    so the call itself is safely bracketed — including on failure, see
    below). Each worker runs under ``inheritable_thread_target`` so the
    caller's JVM thread-local properties (job description/group, scheduler
    pool) carry into the pooled jobs under PySpark's pinned-thread mode
    (default since 3.2), where a plain pool thread would silently drop them
    and ``cancelJobGroup`` could not reach the pooled jobs.

    Failure path: if any subplan's materialization raises, the pool is
    joined first (so no checkpoint is still registering), then every RDD
    this call pinned — completed siblings included — is unpersisted before
    the error propagates; nothing leaks for the session."""
    from concurrent.futures import ThreadPoolExecutor

    dfs = list(dfs)
    if len(dfs) <= 1:
        return [df.localCheckpoint(eager=True) for df in dfs]

    def _materialize(d):
        return d.localCheckpoint(eager=True)

    session = dfs[0].sparkSession
    try:
        from pyspark import inheritable_thread_target

        # wrap in the CALLER's thread: the wrapper captures the caller's
        # JVM thread-local properties (and, given the session, its tags)
        # now and re-applies them inside each worker thread
        _materialize = inheritable_thread_target(session)(_materialize)
    except (ImportError, TypeError):  # pragma: no cover - older PySpark
        from pyspark import inheritable_thread_target

        _materialize = inheritable_thread_target(_materialize)

    sc = session.sparkContext
    before = persistent_rdd_ids(sc)
    try:
        with ThreadPoolExecutor(max_workers=min(max_workers, len(dfs))) as pool:
            futs = [pool.submit(_materialize, df) for df in dfs]
            return [f.result() for f in futs]
    except BaseException:
        # the `with` joined the pool, so every sibling checkpoint finished
        # (or failed) — the id-diff is stable and single-threaded again
        release_rdds(sc, persistent_rdd_ids(sc) - before)
        raise


class RollingCheckpoint:
    """Tracks the RDD ids behind a loop's rolling ``localCheckpoint`` and
    releases each generation when the next one lands::

        rc = RollingCheckpoint(df.sparkSession.sparkContext)
        cur = rc.checkpoint(seed_df)          # eager checkpoint, tracked
        while ...:
            cur = rc.checkpoint(next_df)      # materializes, then frees prev
        return cur                            # final generation stays live
    """

    def __init__(self, sc):
        self._sc = sc
        self._live: set[int] = set()
        self._pending_before: set[int] | None = None

    def checkpoint(self, df, eager: bool = True):
        if self._pending_before is not None:
            # a lazy generation is pending and was never marked: its RDD ids
            # were not captured, so nothing could ever release it — the
            # exact session-lifetime leak this class exists to prevent.
            # Fail loudly (consistent with mark_materialized's contract).
            raise RuntimeError(
                "previous lazy checkpoint was never mark_materialized(); "
                "its RDD would leak for the session — call "
                "mark_materialized() after its materializing action"
            )
        before = persistent_rdd_ids(self._sc)
        out = df.localCheckpoint(eager=eager)
        if eager:
            self.rotate(persistent_rdd_ids(self._sc) - before)
        else:
            # lazy: ids appear at first action; caller calls mark_materialized()
            self._pending_before = before
        return out

    def mark_materialized(self) -> None:
        """For ``eager=False``: call exactly once, right after the action
        that materialized the checkpoint returned by the last ``checkpoint``
        call. Misuse fails loudly — a stale snapshot here would diff in the
        LIVE checkpoint's ids and rotate() would unpersist a
        lineage-truncated RDD still referenced by the caller's DataFrame."""
        if self._pending_before is None:
            raise RuntimeError(
                "no lazy checkpoint pending: call checkpoint(df, eager=False) "
                "first, and mark_materialized() exactly once after its "
                "materializing action"
            )
        pending, self._pending_before = self._pending_before, None
        self.rotate(persistent_rdd_ids(self._sc) - pending)

    def rotate(self, new_ids: set[int]) -> None:
        release_rdds(self._sc, self._live)
        self._live = new_ids

    @property
    def live_ids(self) -> set[int]:
        """RDD ids of the current live generation — lets a caller that
        materializes NESTED checkpoints (e.g. a per-level collapse loop
        inside a tree walk) release everything a round pinned EXCEPT this
        tracker's own checkpoint."""
        return set(self._live)

    def release(self) -> None:
        """Release the live generation and any pending-lazy bookkeeping.

        For the FAILURE path only: when a loop dies mid-iteration (an
        LLM-backed summarizer erroring in round 3), the tracked checkpoint
        would otherwise stay pinned for the session with nothing able to
        free it — ``spark.catalog.clearCache()`` does not release
        localCheckpoints (module docstring). Never call it on success: the
        final generation backs the returned DataFrame's plan. Loops use
        ``try: ... except BaseException: rc.release(); raise``."""
        release_rdds(self._sc, self._live)
        self._live = set()
        self._pending_before = None
