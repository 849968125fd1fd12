"""Size-bounded grouping + recursive collapse (SURVEY §2.4 D4-D8).

The reference greedy-packs consecutive chunk summaries into groups of at most
``token_max`` tokens (``split_list_of_docs``, runners/run_summarization_
ollama_mapreduce.py:130-133), reduces each group with one LLM call, and
repeats until the total fits (``collapse_summaries`` / ``should_collapse``,
ibid.:119-154) — a tree reduce whose levels are driver-orchestrated.

Spark design:

* ``bucket_by_token_budget`` — faithful greedy packing. The greedy scan is a
  sequential fold per document; we run it JVM-side with the ``aggregate``
  higher-order function over a per-doc sorted array (chunk counts per doc are
  bounded — thousands, not millions — so the array fits comfortably in one
  row even for book-length docs).
* ``bucket_running_sum`` — ``floor(running_sum / token_max)`` window variant:
  one expression, SQL-oracle-checkable, and a good approximation when exact
  greedy boundaries don't matter.
* ``collapse_until_fits`` — the driver-side convergence loop (D7). Per round
  every still-too-big document is bucketed and group-reduced **in one Spark
  job over all documents at once** (the reference loops docs serially; Spark
  collapses the whole corpus level-by-level). ``localCheckpoint`` truncates
  lineage so ten rounds don't stack ten plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import ws_token_count


def bucket_running_sum(
    df: DataFrame,
    token_max: int,
    key_cols: tuple[str, ...] = ("doc_id",),
    order_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
    group_col: str = "group_id",
) -> DataFrame:
    """Assign ``group_id = floor((running_sum - n_tokens) / token_max)``.

    Buckets by each chunk's *starting* token offset — a single window
    expression, fully JVM-side, order-explicit via ``order_col``.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL token counts bucket as 0 — same rule as the greedy fold: a raw
    # NULL would give the row a NULL group_id (a phantom bin downstream)
    # and make the two bucketing modes disagree on the same input
    t = F.coalesce(F.col(tokens_col), F.lit(0))
    start_offset = F.sum(t).over(w) - t
    return df.withColumn(group_col, F.floor(start_offset / token_max).cast("int"))


def bucket_by_token_budget(
    df: DataFrame,
    token_max: int,
    key_cols: tuple[str, ...] = ("doc_id",),
    order_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
    group_col: str = "group_id",
) -> DataFrame:
    """Greedy packing identical to the reference's ``split_list_of_docs``:
    start a new group whenever adding the next chunk would push the current
    group past ``token_max`` (an oversize single chunk gets its own group).

    Implemented as a JVM-side sequential fold (``aggregate`` HOF) over the
    per-doc chunk array — no Python, no extra shuffle beyond the per-doc
    grouping that the subsequent group-reduce needs anyway.
    """
    other_cols = [c for c in df.columns if c not in key_cols]
    packed = df.groupBy(*key_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("_ord"), *[F.col(c) for c in other_cols]))
        ).alias("_chunks")
    )

    # fold state: (gid, acc, gids[])  — gids[i] is the group of chunk i
    init = F.struct(
        F.lit(0).alias("gid"),
        F.lit(0).cast("long").alias("acc"),
        F.array().cast("array<int>").alias("gids"),
    )

    def step(st, ch):
        # NULL token counts fold as 0: a single NULL would otherwise poison
        # the accumulator (NULL acc makes `overflow` NULL forever, packing
        # every later chunk into one unbounded group). Corner kept AS the
        # reference-faithful oracle CTEs state it: `acc > 0` stands in for
        # "group non-empty", so a group of only zero-token chunks absorbs
        # the next chunk even when it overflows — the reference's len()
        # check would split there, but reaching it needs a non-empty group
        # with zero total tokens.
        t = F.coalesce(ch[tokens_col].cast("long"), F.lit(0).cast("long"))
        overflow = (st["acc"] > 0) & ((st["acc"] + t) > token_max)
        new_gid = F.when(overflow, st["gid"] + 1).otherwise(st["gid"])
        new_acc = F.when(overflow, t).otherwise(st["acc"] + t)
        return F.struct(
            new_gid.alias("gid"),
            new_acc.alias("acc"),
            F.concat(st["gids"], F.array(new_gid)).alias("gids"),
        )

    folded = packed.withColumn("_gids", F.aggregate(F.col("_chunks"), init, step)["gids"])
    zipped = folded.select(
        *key_cols,
        F.explode(F.arrays_zip(F.col("_chunks"), F.col("_gids"))).alias("_z"),
    )
    return zipped.select(
        *key_cols,
        F.col("_z._chunks._ord").alias(order_col),
        *[F.col(f"_z._chunks.{c}") for c in other_cols if c != order_col],
        F.col("_z._gids").alias(group_col),
    )


def reduce_groups(
    df: DataFrame,
    summarizer,
    key_cols: tuple[str, ...] = ("doc_id", "group_id"),
    order_col: str = "chunk_idx",
    text_col: str = "text",
    joiner: str = "\n\n",
) -> DataFrame:
    """One reduce level: concat each group's texts in chunk order (C9) and
    summarize the concatenation (the reference's ``_reduce``, runners/run_
    summarization_ollama_mapreduce.py:119-127).

    Output: one row per group — ``key_cols + (text, n_tokens)``.
    With a JVM-expressible summarizer the whole level is a single hash
    aggregate; otherwise the summarizer's Arrow UDF runs on the concatenated
    (already small) group texts.
    """
    grouped = df.groupBy(*key_cols).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t")))),
                lambda s: s["t"],
            ),
            joiner,
        ).alias("_joined")
    )
    out = summarizer.summarize_df(grouped, "_joined", text_col).drop("_joined")
    return out.withColumn("n_tokens", ws_token_count(text_col))


def collapse_until_fits(
    df: DataFrame,
    summarizer,
    token_max: int,
    max_rounds: int = 10,
    key_col: str = "doc_id",
    order_col: str = "chunk_idx",
    text_col: str = "text",
    tokens_col: str = "n_tokens",
    greedy: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Driver-side convergence loop (D7): collapse whole corpus level-by-level
    until every document's summaries total <= ``token_max`` (bounded by
    ``max_rounds``, mirroring the reference's ``recursion_limit`` 10).

    Returns a DataFrame with the same shape (key, chunk_idx, text, n_tokens),
    one-or-more rows per doc, each doc's total within budget (or max_rounds
    exhausted — same bail-out the reference has). Pass ``stats`` to receive
    ``{"rounds": n}`` — collapse-round counts are part of the reference's
    observable topology (SURVEY §5) and golden-tested.
    """
    bucket = bucket_by_token_budget if greedy else bucket_running_sum

    # Per-doc totals ride along as a window-sum column materialized WITH each
    # checkpoint, so one job per round both truncates lineage and refreshes
    # the loop predicate; the done/todo split is then a filter on the
    # checkpointed column instead of joins that re-aggregate totals. The
    # INPUT is checkpointed too (round 0), so the upstream chunk+map subtree
    # runs exactly once no matter how many predicates/actions follow — with
    # an LLM-backed summarizer a recompute would mean re-calling the model
    # for every chunk.
    w = Window.partitionBy(key_col)

    def _with_total(d: DataFrame) -> DataFrame:
        # coalesce: SUM skips NULLs, but a doc whose EVERY row has a NULL
        # token count would get a NULL total — failing both the `> budget`
        # and `<= budget` filters and silently vanishing from the loop. As
        # 0 it counts as fitting and passes through unchanged.
        return d.select(
            key_col, order_col, text_col, tokens_col,
            F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).alias("_total"),
        )

    from ._ckpt import RollingCheckpoint

    rc = RollingCheckpoint(df.sparkSession.sparkContext)

    def _ckpt_and_count_todo(d: DataFrame):
        # ONE action per round: the lazy checkpoint materializes under the
        # convergence count (an eager checkpoint + a separate isEmpty probe
        # would double the per-round job count)
        out = rc.checkpoint(d, eager=False)
        n_too_big = out.filter(F.col("_total") > token_max).count()
        rc.mark_materialized()
        return out, n_too_big

    try:
        cur, n_too_big = _ckpt_and_count_todo(
            _with_total(df.select(key_col, order_col, text_col, tokens_col))
        )
        rounds = 0
        while rounds < max_rounds and n_too_big:
            todo = cur.filter(F.col("_total") > token_max).drop("_total")
            done = cur.filter(F.col("_total") <= token_max).drop("_total")
            bucketed = bucket(todo, token_max, (key_col,), order_col, tokens_col)
            reduced = reduce_groups(
                bucketed, summarizer, (key_col, "group_id"), order_col, text_col
            ).withColumnRenamed("group_id", order_col)
            # reduce_groups stamps its token column as "n_tokens"; re-alias
            # so a caller's non-default tokens_col survives the loop
            nxt = done.unionByName(
                reduced.select(
                    key_col, order_col, text_col,
                    F.col("n_tokens").alias(tokens_col),
                )
            )
            # rolling checkpoint: materializes the new round, frees the old
            cur, n_too_big = _ckpt_and_count_todo(_with_total(nxt))
            rounds += 1
    except BaseException:
        # a failed round (LLM summarizer error mid-collapse) must not pin
        # the superseded checkpoint for the session
        rc.release()
        raise
    if stats is not None:
        stats["rounds"] = rounds
    return cur.drop("_total")
