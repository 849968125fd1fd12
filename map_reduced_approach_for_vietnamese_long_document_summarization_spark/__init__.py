"""PySpark-native rebuild of the capabilities of
``Duy1230/Map-Reduced-Approach-for-Vietnamese-Long-Document-Summarization``.

The reference is a single-process Python dataflow (corpus scan -> doc/ref
pairing -> chunk -> per-chunk LLM map -> size-bounded recursive reduce ->
metric UDFs -> statistical aggregation).  This package re-expresses every
stage as an idiomatic Spark DataFrame operator designed for a multi-executor
cluster: declarative plans (Catalyst optimizes), broadcast joins for small
dims, window functions for order-sensitive semantics, Arrow pandas UDFs only
where built-ins cannot express the semantics (LLM calls, per-doc folds).

Subpackages
-----------
``sources``     corpus / tree / metadata IO        (SURVEY §2.1 S1-S8)
``functions``   scalar text functions              (SURVEY §2.8 C1-C14, §2.2 F5-F8)
``operators``   dataflow operators: chunking, collapse, dedup, similarity
                (SURVEY §2.4 D1-D19 + north-star extensions)
``summarize``   the five summarization approaches as DataFrame transforms
``metrics``     ROUGE / cosine / moments / histogram (SURVEY §2.9, §2.5)
``plans``       relational query surface exercised by the harness
``streaming``   Structured Streaming extension over the events table (§2.10)
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
