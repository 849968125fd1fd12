"""Sources & sinks (SURVEY §2.1)."""

from .tables import load_table
from .corpus import read_text_corpus, write_per_doc_text
from .jsonl import (
    read_jsonl_corpus,
    read_jsonl_corpus_stream,
    split_corrupt,
    write_jsonl_corpus,
)
from .shards import read_training_shard, write_training_shards

__all__ = [
    "load_table",
    "read_text_corpus",
    "write_per_doc_text",
    "read_jsonl_corpus",
    "read_jsonl_corpus_stream",
    "split_corrupt",
    "write_jsonl_corpus",
    "read_training_shard",
    "write_training_shards",
]
