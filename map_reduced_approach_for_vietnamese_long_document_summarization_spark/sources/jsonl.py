"""JSONL corpus source/sink — the lingua franca of training-data exchange.

Web-scale corpora ship as newline-delimited JSON (one document object per
line), and a reader that silently nulls out malformed lines is how corpora
lose documents without anyone noticing. This wrapper makes the two
production decisions explicit:

* **Schema is declared, never inferred.** Inference costs a full extra pass
  over the data before the real read (at 100 TB that is the whole job
  twice) and locks the first sample's shape in; every reader here takes an
  explicit schema (default: the engine's document schema).
* **Malformed lines are captured, not dropped.** PERMISSIVE mode routes
  unparseable lines into a ``_corrupt_record`` column; ``split_corrupt``
  returns (clean, corrupt) frames so a pipeline can quarantine bad lines to
  a side sink and keep a loss ledger, instead of choosing between job-fatal
  (FAILFAST) and silent (DROPMALFORMED).

The sink writes gzip-compressed JSONL shards (one file per partition —
sized upstream via ``repartition``), Spark's native distributed text write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the engine's interchange schema for document corpora
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _parse_jsonl_lines(lines: DataFrame, schema: T.StructType) -> DataFrame:
    """Shared parse stage for the batch and streaming readers — ONE
    definition of "what counts as a document vs a corrupt line", so the
    two ingest paths cannot diverge.

    Parses via text + ``from_json`` rather than the native JSON relation:
    Spark disallows queries that reference ONLY the corrupt column of a
    JSON file source (SPARK-21610) — the documented workaround is caching
    the whole corpus, which is exactly wrong at 100 TB. The from_json
    expression has no such restriction, costs the same single pass, and
    JSON scans have no pushdown to lose.

    Blank/whitespace-only lines (double newlines, CRLF endings, tab
    padding) are neither documents nor corruption: from_json would turn
    them into all-NULL "clean" phantom rows — skip them so every mode
    returns the same corpus. The anchored ``rlike`` bails at the first
    non-whitespace character without materializing a stripped copy of each
    (potentially multi-MB) document line. NOT ``F.trim``: that strips only
    ASCII spaces, so a CRLF file's blank lines ("\\r") would slip
    through."""
    if _CORRUPT in schema.fieldNames():
        raise ValueError(
            f"schema already contains {_CORRUPT!r} (re-reading a frame "
            "persisted with its ledger column?) — drop it before reading; "
            "the reader adds its own"
        )
    # copy the schema — StructType.add mutates in place
    full = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    parsed = lines.filter(~F.col("value").rlike(r"^\s*$")).select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("_r")
    )
    return parsed.select("_r.*")


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read a JSONL corpus with a declared schema.

    With ``keep_corrupt=True`` the frame carries a ``_corrupt_record``
    column holding the raw text of lines that failed to parse (NULL for
    clean rows) — feed it to ``split_corrupt``. ``False`` drops bad lines
    for pipelines that have already ledgered them — via the SAME shared
    parse stage, not the native JSON relation's DROPMALFORMED: the native
    source has its own line classification (e.g. it explodes a top-level
    JSON array line into several rows where from_json ledgers it as one
    corrupt record), and two definitions of "document vs corrupt" is how
    the modes silently return different corpora from the same file."""
    parsed = _parse_jsonl_lines(spark.read.text(path), schema)
    if keep_corrupt:
        return parsed
    clean, _corrupt = split_corrupt(parsed)
    return clean


def read_jsonl_corpus_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``read_jsonl_corpus``: watch ``path`` for new JSONL
    files and parse them with the same declared schema + corrupt-line
    ledger semantics (the shared ``_parse_jsonl_lines`` stage — one
    definition, so the batch and streaming ingest paths structurally
    cannot diverge on what counts as a document vs a corrupt line).

    The file source tracks processed files in the query checkpoint, so a
    restarted query resumes where it left off; ``max_files_per_trigger``
    bounds micro-batch size for backfills over a large landing directory.
    Feed the result to ``streaming.write_stream_idempotent_parquet`` for an
    exactly-once landing zone the batch curation stages read via
    ``read_committed_batches``."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _parse_jsonl_lines(reader.text(path), schema)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows without the ledger column, and the raw
    text of every malformed line — quarantine-sink the latter and alert on
    its count; a rising corrupt ratio is usually an upstream format change,
    not noise."""
    if _CORRUPT not in df.columns:
        raise ValueError(f"{_CORRUPT} column missing — read with keep_corrupt=True")
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    corrupt = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return clean, corrupt


def write_jsonl_corpus(
    df: DataFrame, path: str, compression: str = "gzip", mode: str = "error"
) -> None:
    """Write a corpus as compressed JSONL shards (one file per partition —
    `repartition(n)` upstream to size them)."""
    df.write.mode(mode).option("compression", compression).json(path)
