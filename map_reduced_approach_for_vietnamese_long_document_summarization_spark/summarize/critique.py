"""Map-reduce with critique/refine (SURVEY §2.4 D9/D10; runners/
run_summarization_ollama_mapreduce_critique.py).

Reference flow per reduce group (CR:224-265): tag member summaries with
``[PHẦN i]`` section markers, reduce to an initial summary, ask a critic to
compare it against reference content, and — unless the critique contains a
stop phrase ("không có vấn đề" / "no issues") or the iteration cap is hit —
refine once. The final reduce pre-collapses intermediates when they exceed
``token_max // 2`` (CR:305-346).

Spark design: the critique-reduce is a composed per-group function (LLM call
chain + string conditional), so it runs as Python per ``(doc_id, group_id)``
group via ``operators.grouped.grouped_apply_sorted`` — one shuffle on doc_id,
many docs per Arrow invocation, parallel across the corpus. Reference content
for level 1 is the group's original chunks
(positional alignment J5 made explicit by carrying ``orig`` alongside each
summary row); later levels critique against the summaries being collapsed,
exactly as the reference does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import clean_thinking_tokens, ws_token_count
from ..operators.chunking import chunk_documents
from ..operators.collapse import bucket_by_token_budget
from ..operators.grouped import grouped_apply_sorted
from .summarizer import Summarizer

STOP_PHRASES = ("không có vấn đề", "no issues")


class Critic:
    """Critique + refine hooks. Deterministic mock by default: flags every
    other group (FIXTURES.md §7) so both branches are exercised in tests."""

    def critique(self, summary: str, reference: str) -> str:  # pragma: no cover
        raise NotImplementedError

    def refine(self, summary: str, critique: str, reference: str) -> str:  # pragma: no cover
        raise NotImplementedError


class MockCritic(Critic):
    """Flags groups whose summary has an odd token count; refine prepends a
    deterministic marker so refined outputs are distinguishable in asserts."""

    def critique(self, summary: str, reference: str) -> str:
        if len(summary.split()) % 2 == 0:
            return "không có vấn đề"
        return "cần cải thiện: thiếu chi tiết"

    def refine(self, summary: str, critique: str, reference: str) -> str:
        return "[refined] " + summary


class OllamaCritic(Critic):
    """LLM critic mirroring CR:118-201's prompt pair; same pooled-HTTP path
    as OllamaSummarizer."""

    def __init__(self, summarizer):
        self._s = summarizer

    def critique(self, summary: str, reference: str) -> str:
        prompt = (
            "Đánh giá bản tóm tắt sau so với nội dung gốc. Nếu không có vấn "
            "đề, trả lời 'không có vấn đề'.\n\nTÓM TẮT:\n{s}\n\nGỐC:\n{r}"
        ).format(s=summary, r=reference)
        return self._s.summarize_text(prompt)

    def refine(self, summary: str, critique: str, reference: str) -> str:
        prompt = (
            "Cải thiện bản tóm tắt dựa trên phê bình.\n\nTÓM TẮT:\n{s}\n\n"
            "PHÊ BÌNH:\n{c}\n\nGỐC:\n{r}"
        ).format(s=summary, c=critique, r=reference)
        return self._s.summarize_text(prompt)


def _reduce_with_critique(
    texts: list[str],
    origs: list[str],
    summarizer: Summarizer,
    critic: Critic,
    iteration: int,
    max_critique_iterations: int,
) -> str:
    # section tagging (CR:228-233, C10). NULL member texts render as ''
    # (not the literal string 'None'): collapse's JVM twin (array_join)
    # skips NULL elements, and a NULL-summary chunk must not inject noise
    # tokens into the reduce input
    tagged = "\n\n".join(f"[PHẦN {i + 1}]\n{t or ''}" for i, t in enumerate(texts))
    initial = summarizer.summarize_text(tagged)
    if iteration >= max_critique_iterations:
        return initial
    reference = "\n\n---\n\n".join(o or "" for o in origs)
    critique = critic.critique(initial, reference)
    if any(p in critique.lower() for p in STOP_PHRASES):  # C11
        return initial
    return critic.refine(initial, critique, reference)


def _critique_collapse_level(
    df: DataFrame,
    summarizer: Summarizer,
    critic: Critic,
    token_max: int,
    iteration: int,
    max_critique_iterations: int,
    id_col: str,
) -> DataFrame:
    """One collapse level: greedy-bucket then critique-reduce each group."""
    bucketed = bucket_by_token_budget(df, token_max, (id_col,))
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type, False),
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )

    cols = bucketed.columns
    gid_i, text_i, orig_i = cols.index("group_id"), cols.index("text"), cols.index("orig")

    def reduce_doc(key: tuple, rows: list[tuple]) -> list[tuple]:
        # one Python call per DOC, looping its groups in-process (rows arrive
        # chunk_idx-sorted; greedy group_ids are nondecreasing in chunk order,
        # re-sorted defensively) — and grouped_apply_sorted batches many docs
        # per Arrow invocation, so per-group overhead never scales with corpus
        # size. Shuffle key stays (doc), so a doc's groups never scatter.
        out = []
        rows = sorted(rows, key=lambda r: (r[gid_i],))  # stable: keeps chunk order
        start = 0
        for i in range(1, len(rows) + 1):
            if i == len(rows) or rows[i][gid_i] != rows[start][gid_i]:
                g = rows[start:i]
                reduced = _reduce_with_critique(
                    [r[text_i] for r in g],
                    [r[orig_i] for r in g],
                    summarizer,
                    critic,
                    iteration,
                    max_critique_iterations,
                )
                out.append((key[0], int(rows[start][gid_i]), reduced))
                start = i
        return out

    reduced = grouped_apply_sorted(bucketed, (id_col,), "chunk_idx", reduce_doc, schema)
    return reduced.withColumn("n_tokens", ws_token_count("text")).withColumn(
        "orig", F.col("text")  # later levels critique against the summaries themselves
    )


def mapreduce_critique_summarize(
    docs: DataFrame,
    summarizer: Summarizer,
    critic: Critic | None = None,
    chunk_size: int = 12000,
    chunk_overlap: int = 200,
    token_max: int = 10000,
    max_critique_iterations: int = 2,
    max_rounds: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full critique pipeline: chunk -> map -> (bucket -> critique-reduce)*
    -> pre-collapse at token_max//2 if needed (D10) -> final critique-reduce.

    ``max_rounds`` mirrors the reference's recursion_limit 15 (CR:438).
    """
    critic = critic or MockCritic()
    chunks = chunk_documents(docs, chunk_size, chunk_overlap, text_col, (id_col,))
    mapped = summarizer.summarize_df(chunks, "chunk", "summary").select(
        id_col,
        "chunk_idx",
        F.col("summary").alias("text"),
        ws_token_count("summary").alias("n_tokens"),
        F.col("chunk").alias("orig"),  # level-1 critique reference = original chunks
    )

    # Per-doc totals ride along as a window-sum column materialized with each
    # checkpoint (same one-job-per-round shape as operators.collapse.
    # collapse_until_fits, incl. the round-0 input checkpoint: the chunk+map
    # subtree runs exactly once — an LLM-backed summarizer is never re-called
    # for the same chunk); the loop, pre-collapse, and final stages all split
    # on the materialized column instead of re-aggregating totals.
    from pyspark.sql import Window as _W

    w = _W.partitionBy(id_col)
    cols = (id_col, "chunk_idx", "text", "n_tokens", "orig")

    def _with_total(d: DataFrame) -> DataFrame:
        # coalesce: SUM skips NULLs, but a doc whose EVERY row has a NULL
        # token count would get a NULL total — failing both the `> budget`
        # and `<= budget` filters and silently leaving the loop (same rule
        # as collapse_until_fits). As 0 it counts as fitting.
        return d.select(
            *cols, F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("_total")
        )

    from ..operators._ckpt import RollingCheckpoint

    rc = RollingCheckpoint(docs.sparkSession.sparkContext)
    half = token_max // 2

    def _ckpt_and_count_todo(d):
        # ONE action per round (same shape as collapse_until_fits): the lazy
        # checkpoint materializes under the convergence count, instead of an
        # eager-materialize job PLUS a separate isEmpty probe. The same
        # aggregate also counts rows over token_max//2, so the post-loop
        # pre-collapse predicate (CR:315-346) needs no isEmpty job of its
        # own — the loop's final count already answered it (r14, guide
        # §2.4: one job, both thresholds).
        out = rc.checkpoint(d, eager=False)
        row = out.select(
            F.count_if(F.col("_total") > token_max).alias("_big"),
            F.count_if(F.col("_total") > half).alias("_over_half"),
        ).first()
        rc.mark_materialized()
        return out, int(row["_big"]), int(row["_over_half"])

    try:
        cur, n_too_big, n_over_half = _ckpt_and_count_todo(_with_total(mapped))
        iteration = 0
        while iteration < max_rounds and n_too_big:
            todo = cur.filter(F.col("_total") > token_max).drop("_total")
            done = cur.filter(F.col("_total") <= token_max).drop("_total")
            reduced = _critique_collapse_level(
                todo, summarizer, critic, token_max, iteration, max_critique_iterations, id_col
            )
            nxt = done.unionByName(reduced.select(*cols))
            # rolling checkpoint: materializes the new round, then frees the old
            cur, n_too_big, n_over_half = _ckpt_and_count_todo(_with_total(nxt))
            iteration += 1

        # pre-collapse intermediates that exceed token_max//2 (CR:315-346);
        # _total is materialized and the loop's final count already measured
        # the half threshold, so this is a pure driver-side branch
        if n_over_half:
            todo = cur.filter(F.col("_total") > half).drop("_total")
            done = cur.filter(F.col("_total") <= half).drop("_total")
            reduced = _critique_collapse_level(
                todo, summarizer, critic, half, iteration, max_critique_iterations, id_col
            )
            cur = done.unionByName(reduced.select(*cols))
        else:
            cur = cur.drop("_total")
    except BaseException:
        # a failed round (LLM summarizer/critic error) must not pin the
        # superseded checkpoint for the session
        rc.release()
        raise

    # final critique-reduce over each doc's remaining summaries
    final = _critique_collapse_level(
        cur, summarizer, critic, 2**31 - 1, iteration, max_critique_iterations, id_col
    )
    summaries = final.select(id_col, clean_thinking_tokens("text").alias("summary"))
    return docs.select(id_col).join(summaries, id_col, "left").select(
        id_col, F.coalesce("summary", F.lit("")).alias("summary")
    )
