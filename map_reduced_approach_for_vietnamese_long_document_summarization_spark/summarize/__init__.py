"""The five summarization approaches as DataFrame -> DataFrame transforms."""

from .summarizer import MockSummarizer, OllamaSummarizer, Summarizer
from .approaches import (
    iterative_refine_summarize,
    mapreduce_summarize,
    truncated_summarize,
)

__all__ = [
    "Summarizer",
    "MockSummarizer",
    "OllamaSummarizer",
    "truncated_summarize",
    "mapreduce_summarize",
    "iterative_refine_summarize",
]
