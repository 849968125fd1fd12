"""One-call corpus quality report: the full signal battery as one frame.

A training-data pipeline's first question about any new corpus is always
the same battery: how long are the documents, what language, how repetitive,
how much entropy, how far from the corpus's own token distribution? Each
signal exists as its own operator; this composes them into a single
``(doc_id, …signals)`` frame so profiling a corpus is one call and one
output table — the thing a gating decision, a dashboard, or a stratified
inspection sample reads.

Scale design: three scan-side signal groups (counts/quality/lang/
fingerprint — pure Catalyst expressions, zero shuffle), plus the three
aggregation-based signals (char entropy, Gopher repetition, unigram-LM
bits/token), each a narrow per-doc aggregate joined back on the id. The
LM signal reuses ONE persisted postings frame when the caller provides it;
the joins are all id-keyed equi-joins of doc-count-sized frames. Nothing
in the report is corpus-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_token_count
from ..functions.textstats import (
    char_count,
    char_entropy_batch,
    doc_fingerprint,
    language_id,
    quality_score,
    repetition_stats_batch,
)
from .vocab import unigram_logprob


def corpus_quality_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """One row per document with the full quality-signal battery:

    ``(id, n_chars, n_tokens, quality, lang_guess, fingerprint,
    entropy, dup_token_ratio, dup_bigram_ratio, top_token_ratio,
    bits_per_token)``

    Token-less docs keep their row with zeroed aggregate signals (the same
    per-operator contracts). Pass a persisted ``term_postings`` frame to
    share the explode with other lexical consumers.

    Precondition: ``id_col`` is non-NULL and unique. The signal frames are
    merged on id equi-joins, so a NULL-id doc would silently drop from the
    report (NULL never equi-matches), and duplicate ids would fan out —
    assign surrogate ids upstream for corpora that lack them (the same
    contract as ``unigram_logprob`` / ``feature_hash_embed``).
    """
    c = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.coalesce(char_count(c), F.lit(0)).alias("n_chars"),
        F.coalesce(ws_token_count(c), F.lit(0)).alias("n_tokens"),
        F.round(quality_score(c), 6).alias("quality"),
        F.coalesce(language_id(c), F.lit("und")).alias("lang_guess"),
        doc_fingerprint(c).alias("fingerprint"),
    )
    ent = char_entropy_batch(docs, id_col=id_col, text_col=text_col).select(
        id_col, "entropy"
    )
    rep = repetition_stats_batch(docs, id_col=id_col, text_col=text_col)
    lp = unigram_logprob(
        docs, text_col=text_col, id_col=id_col, postings=postings
    ).select(id_col, "bits_per_token")
    return base.join(ent, id_col).join(rep, id_col).join(lp, id_col)


__all__ = ["corpus_quality_report"]
