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

from pyspark.sql import DataFrame, Window
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

    Precondition (shared by every id-keyed lexical operator here —
    ``unigram_logprob``, ``feature_hash_embed``, ``score_quality``,
    ``corpus_quality_report``): ``id_col`` is non-NULL and unique. NULL
    ids merge into ONE groupBy pseudo-document (understating ``n_docs``)
    and never equi-join back — assign surrogate ids upstream.
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


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)`` — the sklearn ``smooth_idf`` form).

    Returns ``(id, rank, term, tf, tfidf)``; ``tfidf`` is rounded to 6
    decimals BEFORE ranking and ties break on ``term`` ascending, so the
    cut is deterministic and engine-portable. ``N`` counts documents with
    at least one token (NULL/empty texts can't deflate the idf).

    Scale design: the corpus explodes once into ``(id, term, tf)`` postings
    (map-side-combinable aggregate, one shuffle). The document-frequency
    map is a per-term rollup of those postings — partial aggregation keeps
    stopword skew off any single reducer — and joins back broadcast
    (``broadcast_vocab=False`` falls back to a sort-merge join for corpora
    whose vocabulary outgrows a broadcast, e.g. web-scale token sets). The
    per-document top-k is a window over the doc's own terms, partitioned by
    ``id`` — no global sort. The postings table is consumed twice (df map +
    score join); pass a pre-persisted ``postings``
    (``term_postings(docs).persist()``) to pay the explode once, and
    unpersist it after the action — the caller owns that lifecycle.
    """
    from .retrieval import term_postings

    post = postings if postings is not None else term_postings(docs, text_col, id_col)
    df_map = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_vocab:
        df_map = F.broadcast(df_map)
    if postings is not None:
        # N from the (persisted) postings frame — countDistinct of ids ==
        # docs with >=1 token — keeping the documented "corpus explodes
        # once" contract; a raw-text scan here would defeat the parameter
        n_docs = post.agg(F.countDistinct(id_col).alias("n_docs"))
    else:
        # no reusable frame: a length-only scan (column-pruned, no shuffle)
        # is cheaper than replaying the postings explode a third time —
        # the same trade bm25_topk documents for its corpus stats
        from ..functions.text import ws_token_count

        n_docs = (
            docs.select(ws_token_count(F.col(text_col)).alias("_dl"))
            .filter(F.col("_dl") > 0)
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
    scored = (
        post.join(df_map, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            "tfidf",
        )
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    broadcast_vocab: bool = True,
    retain_missing: bool = True,
) -> DataFrame:
    """Per-document bits-per-token under the corpus's own unigram LM — the
    CCNet-style (arXiv 1911.00359) perplexity quality signal, with the
    corpus itself as the language model instead of external KenLM.

    ``bits(d) = (1/|d|) * Σ_w tf_d(w) · (log2(T) − log2(c(w)))`` where
    ``c(w)`` is the corpus count and ``T`` the corpus token total. Low
    scores mark template/boilerplate text (all common words); high scores
    mark rare-token gibberish — the two tails a quality gate trims.

    Returns one row per input document: ``(id, n_tokens, bits_per_token)``
    with tokenless docs kept at ``(0, 0.0)``. The float sum runs over a
    doc's distinct terms (same-magnitude addends), so ``round(6)`` is
    engine-stable — the same argument as ``char_entropy_batch``.

    Scale design: one postings explode (shared with TF-IDF/BM25 — pass a
    persisted ``postings`` to reuse it), a per-term rollup for the LM
    (partial-agg'd, broadcast back; disable ``broadcast_vocab`` for
    web-scale vocabularies), a 1-row total, and one grouped sum per doc.

    ``retain_missing=False`` skips the docs-id join that restores
    token-less documents as ``(0, 0.0)`` rows — for callers
    (``corpus_quality_report``) whose own retaining join re-attaches the
    frame anyway; with it and a caller-provided ``postings``, ``docs`` is
    never scanned at all.
    """
    from .retrieval import term_postings

    post = postings if postings is not None else term_postings(docs, text_col, id_col)
    lm = post.groupBy("term").agg(F.sum("tf").alias("c"))
    total = lm.agg(F.sum("c").alias("t"))
    if broadcast_vocab:
        lm = F.broadcast(lm)
    per_doc = (
        post.join(lm, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("_n"),
            F.sum(F.col("tf") * (F.log2("t") - F.log2("c"))).alias("_bits"),
        )
    )
    src = docs.select(id_col).join(per_doc, id_col, "left") if retain_missing else per_doc
    return src.select(
        id_col,
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_tokens"),
        F.round(
            F.coalesce(F.col("_bits") / F.col("_n"), F.lit(0.0)), 6
        ).alias("bits_per_token"),
    )
