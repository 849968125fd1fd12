"""Chunk splitting (SURVEY §2.4 D1): one document row -> many ordered chunk rows.

The reference uses langchain's ``RecursiveCharacterTextSplitter`` with the
separator hierarchy ``["\\n\\n", "\\n", ".", "!", "?", ";", " ", ""]``, a
token-based length function, ``chunk_size`` and ``chunk_overlap``
(run_full_evaluation_pipeline.py:356-361, runners/run_summarization_ollama_
mapreduce.py:187-189).

Two implementations:

* ``chunk_documents`` — faithful recursive splitter. The split logic is pure
  Python (it is inherently a sequential scan over one string), run inside an
  Arrow-batched pandas UDF and exploded; Spark parallelizes **across**
  documents, which is the axis that matters at scale (millions of docs).
* ``chunk_fixed_tokens`` — fixed-size token-window chunker expressed entirely
  in Catalyst expressions (``sequence`` + ``posexplode`` + ``slice``); SQL-
  oracle-checkable and the fast path when separator awareness isn't needed.

Both emit ``(.., chunk_idx int, chunk string, n_tokens int)`` with explicit
ordering in ``chunk_idx`` — order is never implied by row order (the iterative
fold and critique alignment depend on it, SURVEY §2.4 D11/J5).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SEPARATORS: tuple[str, ...] = ("\n\n", "\n", ".", "!", "?", ";", " ", "")


def ws_len(text: str) -> int:
    """Whitespace token length (the reference's default length function)."""
    return len(text.split())


def _split_on(text: str, sep: str) -> list[str]:
    """Split keeping the separator attached to the preceding piece."""
    if sep == "":
        return list(text)
    parts = text.split(sep)
    out = []
    for i, p in enumerate(parts):
        piece = p + sep if i < len(parts) - 1 else p
        if piece:
            out.append(piece)
    return out


def _merge_pieces(
    pieces: list[str], chunk_size: int, chunk_overlap: int, length_fn
) -> list[str]:
    """Greedy merge of adjacent pieces into chunks <= chunk_size, carrying
    ``chunk_overlap`` tokens of trailing context into the next chunk —
    langchain ``_merge_splits`` semantics (flush on would-overflow, retain a
    maximal trailing suffix within the overlap, then shed retained overlap
    until the INCOMING piece fits the budget too; without the shed, overlap
    + piece could exceed chunk_size by up to chunk_overlap tokens)."""
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for piece in pieces:
        plen = length_fn(piece)
        if cur and cur_len + plen > chunk_size:
            chunks.append(" ".join(cur).strip())
            if chunk_overlap > 0:
                # retain trailing pieces totalling <= chunk_overlap tokens
                keep: list[str] = []
                klen = 0
                for prev in reversed(cur):
                    pl = length_fn(prev)
                    if klen + pl > chunk_overlap:
                        break
                    keep.insert(0, prev)
                    klen += pl
                while keep and klen + plen > chunk_size:
                    klen -= length_fn(keep.pop(0))
                cur, cur_len = keep, klen
            else:
                cur, cur_len = [], 0
        cur.append(piece)
        cur_len += plen
    if cur:
        chunks.append(" ".join(cur).strip())
    return [c for c in chunks if c]


def recursive_split_text(
    text: str,
    chunk_size: int,
    chunk_overlap: int = 0,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
    length_fn=ws_len,
) -> list[str]:
    """Recursive character split with token-budget merge and overlap.

    Semantics mirror the reference's splitter (langchain
    RecursiveCharacterTextSplitter via run_full_evaluation_pipeline.py:
    356-361) at the token level, in the three ways the round-13 planted
    pipeline fuzzer pins:

    * the active separator is the FIRST one actually PRESENT in the text
      (absent separators are skipped, not recursed through);
    * ``chunk_overlap`` applies at EVERY merge level, including inside the
      recursion for oversized pieces (the pre-r13 engine passed overlap 0
      down, so long uniform text chunked with no overlap at all — the
      planted closed form m = 1 + ceil((N-C)/(C-V)) caught it);
    * an oversized piece's recursive sub-chunks are emitted IN PLACE,
      never re-merged with sibling pieces (langchain extends
      ``final_chunks`` directly), so a recursion tail can't absorb the
      next sibling.

    Known divergence: merged pieces are re-joined with ``' '`` and
    stripped, and non-whitespace separators attach to the PRECEDING piece
    (langchain keep_separator=True prepends to the following one), so
    chunk TEXT can differ byte-wise and a ``". word"``-style piece counts
    tokens differently in pathological spacing; token budgets, ordering,
    and counts match on whitespace-separated prose. Preserve the source
    separators on re-join if byte-level chunk parity ever matters.
    """
    if length_fn(text) <= chunk_size:
        t = text.strip()
        return [t] if t else []

    # first separator PRESENT in the text; "" (char split) is the fallback
    sep = ""
    rest: tuple[str, ...] = ()
    for i, s in enumerate(separators):
        if s == "":
            break
        if s in text:
            sep = s
            rest = separators[i + 1 :]
            break

    chunks: list[str] = []
    good: list[str] = []

    def flush() -> None:
        if good:
            chunks.extend(_merge_pieces(good, chunk_size, chunk_overlap, length_fn))
            good.clear()

    for part in _split_on(text, sep):
        piece = part.strip() if sep != "" else part
        if not piece:
            continue
        if length_fn(piece) <= chunk_size:
            good.append(piece)
        elif not rest:
            # unsplittable oversized piece: emit as-is (own chunk)
            flush()
            chunks.append(piece)
        else:
            flush()
            chunks.extend(
                recursive_split_text(piece, chunk_size, chunk_overlap, rest, length_fn)
            )
    flush()
    return [c for c in chunks if c]


_CHUNK_ARR = T.ArrayType(T.StringType())


def chunk_documents(
    docs: DataFrame,
    chunk_size: int,
    chunk_overlap: int = 0,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> DataFrame:
    """Explode documents into ordered chunks via the recursive splitter.

    Output: ``id_cols + (chunk_idx int, chunk string, n_tokens int)``.
    Parallelism = document partitions; the Python splitter sees one Arrow
    batch of documents at a time (no per-row serde).
    """
    seps = tuple(separators)

    @F.pandas_udf(_CHUNK_ARR)
    def split_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: recursive_split_text(t or "", chunk_size, chunk_overlap, seps)
        )

    exploded = docs.select(
        *id_cols, F.posexplode(split_udf(F.col(text_col))).alias("chunk_idx", "chunk")
    )
    # chunks are already stripped by the splitter and never empty; count
    # with (?U)\s+ so the STAMPED count uses the same Unicode-whitespace
    # unit the Python splitter's budget (str.split) just enforced — a bare
    # ASCII \s would under-count NBSP-glued words relative to the budget
    # that formed the chunk, over-packing downstream token-bounded groups
    return exploded.withColumn(
        "n_tokens", F.size(F.split(F.col("chunk"), r"(?U)\s+"))
    )


def chunk_fixed_tokens(
    docs: DataFrame,
    chunk_size: int,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Pure-Catalyst fixed-token-window chunker (no Python anywhere).

    ``tokens[i*chunk_size : (i+1)*chunk_size]`` per chunk; the last chunk may
    be short. Whole plan stays in whole-stage codegen — this is the 100 TB
    fast path and the oracle-checkable twin of ``chunk_documents``.

    Plan shape matters here (the ``term_postings`` lesson, round 4): the
    token array is materialized in its OWN projection, and the generator
    explodes the pre-sliced per-chunk arrays. Putting ``toks.alias(...)``
    in the same select as the posexplode parks the un-materialized
    tokenization in the projection ABOVE the Generate — re-run per CHUNK
    row, which on a 15k-token document re-tokenizes ~100 KB of text ~300
    times (measured 2.7s/doc -> ~10ms/doc after this shape). Exploding the
    nested chunk arrays (rather than chunk indices) also keeps the full
    token array out of the generated rows — each output row carries only
    its own ``chunk_size`` tokens.
    """
    from ..functions.text import tokenize_ws

    # NULL text behaves like empty text (one row, chunk '', n_tokens 0):
    # raw tokenize_ws(NULL) is NULL, whose size() is -1 under the engine's
    # ANSI-off confs — a (chunk NULL, n_tokens -1) row that poisons every
    # downstream token aggregate
    toks = F.coalesce(tokenize_ws(text_col), F.array().cast("array<string>"))
    with_toks = docs.select(*id_cols, toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    n_chunks = F.greatest(F.lit(1), F.ceil(n / F.lit(chunk_size))).cast("int")
    chunks_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_toks"), i * chunk_size + 1, chunk_size),
    )
    ex = with_toks.select(
        *id_cols, F.posexplode(chunks_arr).alias("chunk_idx", "_ctoks")
    )
    return ex.select(
        *id_cols,
        F.col("chunk_idx"),
        F.array_join("_ctoks", " ").alias("chunk"),
        F.size("_ctoks").alias("n_tokens"),
    )
