"""The five summarization approaches as DataFrame -> DataFrame transforms."""

from .summarizer import MockSummarizer, OllamaSummarizer, Summarizer
from .approaches import (
    iterative_refine_summarize,
    mapreduce_summarize,
    truncated_summarize,
)
from .critique import Critic, MockCritic, OllamaCritic, mapreduce_critique_summarize
from .hierarchical import flatten_tree_json, hierarchical_summarize

__all__ = [
    "Summarizer",
    "MockSummarizer",
    "OllamaSummarizer",
    "truncated_summarize",
    "mapreduce_summarize",
    "iterative_refine_summarize",
    "Critic",
    "MockCritic",
    "OllamaCritic",
    "mapreduce_critique_summarize",
    "flatten_tree_json",
    "hierarchical_summarize",
]
