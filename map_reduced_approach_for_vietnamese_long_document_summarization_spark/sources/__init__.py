"""Sources & sinks (SURVEY §2.1)."""

from .tables import load_table
from .corpus import read_text_corpus, write_per_doc_text

__all__ = ["load_table", "read_text_corpus", "write_per_doc_text"]
