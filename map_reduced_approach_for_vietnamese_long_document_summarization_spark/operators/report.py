"""One-call corpus quality report: the full signal battery as one frame.

A training-data pipeline's first question about any new corpus is always
the same battery: how long are the documents, what language, how repetitive,
how much entropy, how far from the corpus's own token distribution? Each
signal exists as its own operator; this composes them into a single
``(doc_id, …signals)`` frame so profiling a corpus is one call and one
output table — the thing a gating decision, a dashboard, or a stratified
inspection sample reads.

Scale design (round-13 optimization, guide §2.4 "remove shuffles
outright"): ONE scan computes every per-row signal — counts, quality,
language, fingerprint AND char entropy, all pure Catalyst expressions —
and ONE shared token explode (``tagged_token_counts``, persisted) feeds
both aggregation-based signals (Gopher repetition and unigram-LM
bits/token), which re-attach with two id-keyed left joins against the
scan-side frame. The pre-fusion shape paid four corpus scans plus three
per-signal docs-id retaining joins for the same output (measured 3.8s ->
2.3s at sf0.1, plan 12 joins -> ~6; identical rows by the oracle's value
hash). The LM signal reuses the caller's persisted postings frame when
provided. Nothing in the report is corpus-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_token_count
from ..functions.textstats import (
    char_count,
    char_entropy_expr,
    doc_fingerprint,
    language_id,
    quality_score,
    repetition_stats_batch,
    tagged_token_counts,
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
    # every per-row signal in ONE projection over ONE scan — entropy
    # included (char_entropy_expr; the separate char_entropy_batch scan +
    # id join of the pre-fusion shape bought nothing: same arithmetic)
    base = docs.select(
        F.col(id_col),
        F.coalesce(char_count(c), F.lit(0)).alias("n_chars"),
        F.coalesce(ws_token_count(c), F.lit(0)).alias("n_tokens"),
        F.round(quality_score(c), 6).alias("quality"),
        F.coalesce(language_id(c), F.lit("und")).alias("lang_guess"),
        doc_fingerprint(c).alias("fingerprint"),
        char_entropy_expr(c).alias("entropy"),
    )
    # one shared token explode for both aggregation-based signals; persisted
    # because repetition and the LM postings both read it (two consumers).
    # Released via the result's unpersist hook (operators.unpersist_inputs).
    counts = tagged_token_counts(docs, id_col=id_col, text_col=text_col).persist()
    rep = repetition_stats_batch(
        docs, id_col=id_col, text_col=text_col, counts=counts, retain_missing=False
    )
    post = (
        postings
        if postings is not None
        else counts.filter(F.col("_k") == 1).select(
            id_col, F.col("_v").alias("term"), F.col("_c").alias("tf")
        )
    )
    lp = unigram_logprob(
        docs, text_col=text_col, id_col=id_col, postings=post, retain_missing=False
    ).select(id_col, "bits_per_token")
    # base covers every document (per-row), so two LEFT joins re-attach the
    # aggregate signals and token-less docs coalesce to the operators' zero
    # contracts — replacing the pre-fusion three per-signal retaining joins
    out = (
        base.join(rep, id_col, "left")
        .join(lp, id_col, "left")
        .select(
            id_col,
            "n_chars",
            "n_tokens",
            "quality",
            "lang_guess",
            "fingerprint",
            "entropy",
            F.coalesce("dup_token_ratio", F.lit(0.0)).alias("dup_token_ratio"),
            F.coalesce("dup_bigram_ratio", F.lit(0.0)).alias("dup_bigram_ratio"),
            F.coalesce("top_token_ratio", F.lit(0.0)).alias("top_token_ratio"),
            F.coalesce("bits_per_token", F.lit(0.0)).alias("bits_per_token"),
        )
    )
    out._persisted_inputs = [counts]
    return out


__all__ = ["corpus_quality_report"]
