"""Sources & sinks (SURVEY §2.1)."""

from .tables import load_table
from .corpus import read_text_corpus, write_per_doc_text
from .shards import read_training_shard, write_training_shards

__all__ = [
    "load_table",
    "read_text_corpus",
    "write_per_doc_text",
    "read_training_shard",
    "write_training_shards",
]
