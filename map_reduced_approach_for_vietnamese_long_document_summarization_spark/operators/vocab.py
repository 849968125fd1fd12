"""Corpus vocabulary / frequent-n-gram extraction — training-data analysis.

The heavy-hitter pass every corpus pipeline runs before tokenizer training
or boilerplate hunting: which n-grams dominate the corpus, and how widely
are they spread (occurrences vs document frequency — a phrase with high
occurrence but low doc-frequency is one spammy document; high doc-frequency
marks template boilerplate worth a C4-style filter rule).

No reference counterpart (the reference evaluates a fixed corpus, it never
profiles one); this is the engine's north-star training-pipeline surface
(BASELINE.json), next to dedup/contamination in ``operators/``.

Scale design: one explode of non-distinct grams -> hash aggregate. The
count AND the doc-frequency both come from a single (gram, doc) pre-
aggregate, so the wide exploded stream is combined map-side before the only
shuffle; top-k goes through ``orderBy(...).limit(k)`` which Spark executes
as TakeOrderedAndProject (per-partition top-k + driver merge of k rows —
no global sort of the vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_expr


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Top-``k`` word ``n``-grams by total occurrence count.

    Returns ``(ngram, n_occurrences, n_docs)`` ordered by
    ``(n_occurrences DESC, ngram)`` — the tie-break makes the cut
    deterministic. Tokens are lowercased whitespace tokens (the corpus
    convention everywhere in this engine); ``min_doc_freq`` drops grams
    seen in fewer documents (hapax noise) before the top-k.

    Two-level aggregate: per-(gram, doc) counts first — that map-side
    combine collapses the exploded stream to at most
    |distinct grams per doc| rows before the shuffle and gives doc
    frequency for free — then the per-gram rollup.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(shingles_expr(text_col, n=n, distinct=False)).alias("ngram"),
    )
    per_doc = grams.groupBy("ngram", id_col).agg(F.count(F.lit(1)).alias("_c"))
    out = (
        per_doc.groupBy("ngram")
        .agg(
            F.sum("_c").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_doc_freq)
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )
    return out
