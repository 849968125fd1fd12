"""Utility batch jobs (SURVEY §2 TR rows: ``utils/calculate_tokens.py``,
``utils/clean_summaries.py``) as one-expression DataFrame jobs."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import clean_thinking_tokens, ws_token_count
from ..sources.corpus import read_text_corpus, write_per_doc_text


def corpus_token_stats(docs: DataFrame, out_json: str | None = None) -> tuple[DataFrame, dict]:
    """Per-doc metadata rows + corpus totals (utils/calculate_tokens.py:46-103).

    Returns (rows_df, totals). ``out_json`` writes the rows as JSON lines
    (S4 metadata sink) plus a ``_totals.json`` header next to them — the
    reference's ``{files: [...], totals: {...}}`` shape split into a
    distributed sink + a scalar driver object. The header is written with a
    driver-local open(): pass a LOCAL out_json (the reference's metadata
    layout is a local artifact); the rows sink itself is distributed.

    ``tokens`` and ``words`` deliberately carry the SAME whitespace count:
    the reference's tokens column is an HF-tokenizer count
    (calculate_tokens.py:10-11), which lives behind the real-model seam —
    swap ``functions.bpe.bpe_token_count_udf`` (or the HF path when
    installed) into the tokens column for subword-accurate metadata."""
    rows = docs.select(
        "doc_id",
        ws_token_count("text").alias("tokens"),
        F.length("text").alias("characters"),
        ws_token_count("text").alias("words"),
    )
    if out_json:
        # the totals agg AND the sink both consume rows: persist so the
        # corpus tokenization runs once, not twice end-to-end
        rows = rows.persist()
    t = rows.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
        F.avg("tokens").alias("avg_tokens"),
        F.sum("characters").alias("total_characters"),
    ).first()
    totals = {
        "n_docs": t["n_docs"],
        "total_tokens": int(t["total_tokens"] or 0),
        "avg_tokens": float(t["avg_tokens"] or 0.0),
        "total_characters": int(t["total_characters"] or 0),
    }
    if out_json:
        rows.write.mode("overwrite").json(out_json)
        with open(f"{out_json.rstrip('/')}/_totals.json", "w") as f:
            json.dump(totals, f, indent=2)
        rows.unpersist()
    return rows, totals


def clean_summaries_job(
    spark: SparkSession, in_dir: str, out_dir: str, glob: str = "*.txt"
) -> DataFrame:
    """Batch thinking-token clean of a summary directory
    (utils/clean_summaries.py:102-150): scan -> regex clean (F5) -> per-doc
    sink (S5). Returns the cleaned DataFrame."""
    corpus = read_text_corpus(spark, in_dir, glob)
    cleaned = corpus.select("doc_id", clean_thinking_tokens("text").alias("summary"))
    write_per_doc_text(cleaned, out_dir)
    return cleaned
