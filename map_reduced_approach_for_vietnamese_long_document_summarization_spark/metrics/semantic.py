"""Semantic similarity (SURVEY §2.9 M2/M3).

Embedding cosine similarity as a pure Catalyst expression over
``array<float|double>`` columns — the deterministic core of the reference's
sentence-transformer metric (evaluate/evaluate_summaries_semantic.py:135-139).
Actual sentence-embedding *models* (all-MiniLM, BERTScore) are pluggable
encoders behind an import-try; the engine's data plane only ever sees the
vector columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """JVM-side dot product, iterating in array order (oracle-bit-exact)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity_expr(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a.b / (|a|*|b|); 0.0 for zero-norm inputs.

    NULL (not 0.0, not an error) when either vector is NULL, contains a
    NULL element, or the lengths differ (``zip_with`` pads the shorter side
    with NULLs, which propagate through the dot product). Deliberate: a
    corrupt or truncated embedding is UNKNOWN similarity, and SQL's
    NULL-skipping aggregates then exclude it from means — but callers
    averaging downstream should count NULLs separately if silent sample
    shrinkage matters (``F.count`` vs ``F.count(col)``)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    num = dot_expr(a, b)
    denom = F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b))
    # chained when WITHOUT otherwise: a NULL denominator (NULL/corrupt
    # vector) yields NULL, not a fabricated 0.0 — an otherwise(0.0) would
    # rank garbage embeddings ABOVE genuinely dissimilar (negative-cosine)
    # neighbors in every top-k path; desc ordering puts NULLs last
    return F.when(denom > 0, num / denom).when(denom == 0, F.lit(0.0))


def bert_score_encoder():  # pragma: no cover - optional heavy dependency
    """BERTScore is model-backed (M2): return the library hook if installed,
    else None — callers fall back to recording null bert_f1, matching the
    reference's own recorded-failure behavior (BASELINE.md dataset-2 note)."""
    try:
        import bert_score  # type: ignore

        return bert_score
    except ImportError:
        return None
