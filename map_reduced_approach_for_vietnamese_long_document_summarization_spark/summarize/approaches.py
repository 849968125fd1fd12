"""Summarization approaches as DataFrame transforms (SURVEY §3 / §7).

Each takes ``docs(doc_id, text)`` + a ``Summarizer`` and returns
``(doc_id, summary)``. The reference loops documents serially on one process;
here every stage is a corpus-wide Spark job, so 'per-doc' work parallelizes
across executors for free (the fix for the reference's fake-parallel fan-out,
SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import clean_thinking_tokens, truncate_tokens, ws_token_count
from ..operators.chunking import chunk_documents
from ..operators.collapse import collapse_until_fits, reduce_groups
from ..operators.grouped import grouped_apply_sorted
from .summarizer import Summarizer


def truncated_summarize(
    docs: DataFrame,
    summarizer: Summarizer,
    max_input_tokens: int = 16384,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Truncated baseline (TR, runners/run_summarization_ollama.py:86-96):
    docs over the context budget are token-truncated (F6/F7) before the
    single summarize call. Entirely JVM-side with the mock summarizer."""
    n = ws_token_count(text_col)
    prepped = docs.select(
        id_col,
        F.when(n > max_input_tokens, truncate_tokens(text_col, max_input_tokens))
        .otherwise(F.col(text_col))
        .alias("_input"),
    )
    out = summarizer.summarize_df(prepped, "_input", "summary")
    return out.select(
        id_col, F.coalesce(clean_thinking_tokens("summary"), F.lit("")).alias("summary")
    )


def mapreduce_summarize(
    docs: DataFrame,
    summarizer: Summarizer,
    chunk_size: int = 1200,
    chunk_overlap: int = 50,
    token_max: int = 1000,
    max_rounds: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Map-reduce (MR, runners/run_summarization_ollama_mapreduce.py):
    chunk (D1) -> per-chunk map (D2/D3) -> collect (D4) -> size-bounded
    recursive collapse (D5-D7) -> final reduce (D8) -> clean (F5)."""
    chunks = chunk_documents(docs, chunk_size, chunk_overlap, text_col, (id_col,))
    mapped = (
        summarizer.summarize_df(chunks, "chunk", "text")
        .select(
            id_col,
            "chunk_idx",
            "text",
            ws_token_count("text").alias("n_tokens"),
        )
    )
    # collapse_until_fits checkpoints its input, so the Python chunker + map
    # run exactly once; the final reduce reads the checkpointed output
    collapsed = collapse_until_fits(
        mapped, summarizer, token_max, max_rounds, key_col=id_col
    )
    final = reduce_groups(
        collapsed.withColumn("group_id", F.lit(0)),
        summarizer,
        key_cols=(id_col, "group_id"),
    ).drop("group_id", "n_tokens")
    summaries = final.select(id_col, clean_thinking_tokens("text").alias("summary"))
    # retain every input doc: empty/whitespace docs chunk to nothing and would
    # otherwise vanish — a reference user expects one summary row per doc
    return docs.select(id_col).join(summaries, id_col, "left").select(
        id_col, F.coalesce("summary", F.lit("")).alias("summary")
    )


def default_refine_prompt(summary: str, chunk: str) -> str:
    """Input to the refine step: previous summary + new context. The
    reference's iterative runner uses a fuller Vietnamese prompt pair
    (runners/run_summarization_ollama_iterative.py:106-147) — pass a custom
    ``refine_fn`` to reproduce it verbatim with a live LLM; the
    concatenation default keeps the mock pipeline deterministic."""
    return summary + "\n\n" + chunk


def iterative_refine_summarize(
    docs: DataFrame,
    summarizer: Summarizer,
    chunk_size: int = 800,
    chunk_overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    refine_fn=default_refine_prompt,
) -> DataFrame:
    """Iterative refinement (IT, runners/run_summarization_ollama_iterative.py
    :154-187): summary_0 = summarize(chunk_0); summary_i = refine(summary_{i-1},
    chunk_i), folding left-to-right in chunk order.

    Inherently sequential *within* a document, embarrassingly parallel
    *across* documents: ``grouped_apply_sorted`` hands each doc's chunk_idx-
    ordered chunk list to one task (D11), batching many docs per Python
    invocation — per-group applyInPandas overhead dominated wall time on
    many-small-docs corpora. Order comes from the explicit ``chunk_idx``
    partition sort, never row order."""
    chunks = chunk_documents(docs, chunk_size, chunk_overlap, text_col, (id_col,))
    fn = summarizer
    schema = T.StructType(
        [
            T.StructField(id_col, chunks.schema[id_col].dataType, False),
            T.StructField("summary", T.StringType(), True),
        ]
    )
    chunk_i = chunks.columns.index("chunk")

    def fold(key: tuple, rows: list[tuple]) -> list[tuple]:
        summary = ""
        for row in rows:
            chunk = row[chunk_i]
            if not summary:
                summary = fn.summarize_text(chunk)
            else:
                summary = fn.summarize_text(refine_fn(summary, chunk))
        return [(key[0], summary)]

    out = grouped_apply_sorted(chunks, (id_col,), "chunk_idx", fold, schema)
    folded = out.select(id_col, clean_thinking_tokens("summary").alias("summary"))
    return docs.select(id_col).join(folded, id_col, "left").select(
        id_col, F.coalesce("summary", F.lit("")).alias("summary")
    )
