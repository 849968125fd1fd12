"""Text-corpus source & sink (SURVEY §2.1 S1/S2/S5).

The reference's fundamental abstraction is 'a directory of UTF-8 text files
keyed by filename' (SURVEY §1; run_full_evaluation_pipeline.py:417-444).
Spark-first: ``binaryFile`` source (splits across executors, supports glob
pushdown via ``pathGlobFilter``) decoded to ``(doc_id, text)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import filename_stem


def read_text_corpus(
    spark: SparkSession, path: str, glob: str = "*.txt"
) -> DataFrame:
    """Scan ``path`` for text files -> ``(doc_id, text)``; one row per file.

    ``pathGlobFilter`` is the extension filter (S2) applied at listing time —
    filtered files are never opened. doc_id = filename stem, the reference's
    join key. Note: the binaryFile source skips zero-byte files — empty
    documents don't produce rows.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", F.col("content").cast("string").alias("text"))
    )
    return raw.select(filename_stem("path").alias("doc_id"), "text")


def write_per_doc_text(df: DataFrame, out_dir: str, id_col: str = "doc_id", text_col: str = "summary") -> None:
    """Per-doc text sink (S5): one output file per document, idempotent by key.

    The reference writes ``<dir>/<fname>`` per summary (run_full_evaluation_
    pipeline.py:569-570). Distributed equivalent: partition the write by
    doc_id so each doc lands in its own directory. DYNAMIC partition
    overwrite (a per-write option, no session conf) replaces only the
    partitions present in THIS frame — under Spark's default static mode,
    mode('overwrite') truncates the whole output directory first, so an
    incremental rerun whose frame holds only the NEW docs (the
    ``skip_existing`` pairing, F3) would silently delete every previously
    written document.
    """
    (
        df.select(id_col, F.col(text_col).alias("value"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(id_col)
        .text(out_dir)
    )


def collect_to_files(
    df, out_dir: str, id_col: str = "doc_id", text_col: str = "summary", ext: str = ".txt"
) -> int:
    """Exact reference-layout sink: one ``<out_dir>/<doc_id>.txt`` per row
    (run_full_evaluation_pipeline.py:569-570). DRIVER-SIDE collect — for
    demo/small outputs only; the distributed path is ``write_per_doc_text``.
    doc_ids are sanitized to safe filenames (path separators replaced);
    returns the number of distinct files written (last row wins on
    duplicate ids). DISTINCT ids that sanitize to the SAME filename
    ('a/b' vs 'a_b') raise instead of silently overwriting one document
    with another."""
    import os
    import re

    os.makedirs(out_dir, exist_ok=True)
    written = set()
    owner: dict[str, str] = {}  # sanitized path -> raw id that claimed it
    for r in df.select(id_col, text_col).collect():
        raw = str(r[id_col])
        safe = re.sub(r"[^\w.-]", "_", raw)
        path = os.path.join(out_dir, f"{safe}{ext}")
        if owner.setdefault(path, raw) != raw:
            raise ValueError(
                f"doc ids {owner[path]!r} and {raw!r} both sanitize to "
                f"{safe + ext!r} — one summary would silently overwrite "
                "the other; disambiguate the ids upstream"
            )
        with open(path, "w", encoding="utf-8") as f:
            f.write(r[text_col] or "")
        written.add(path)
    return len(written)
