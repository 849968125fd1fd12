"""Lexical retrieval: BM25 scoring and top-k keyword search over a corpus.

The similarity-search family (`operators/similarity.py`) covers the dense
(embedding) side; this is the sparse side — Okapi BM25, the default lexical
ranking function, as pure DataFrame aggregates:

    score(D, Q) = Σ_{t in Q} idf(t) * tf(t,D)·(k1+1)
                              ──────────────────────────────────────
                              tf(t,D) + k1·(1 - b + b·|D|/avgdl)

    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )   (Lucene form)

Scale design: the corpus explodes once into (doc, term, tf) postings —
map-side combinable aggregates, one shuffle keyed by (doc, term). Document
frequencies for the (few) query terms reduce to a tiny map that joins back
broadcast; the per-doc score is then one grouped sum over the filtered
postings. Nothing is ever per-query-per-doc except postings that actually
contain a query term — the inverted-index access pattern, expressed
relationally. N and avgdl are scalar aggregates (1-row broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_ws


def term_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf, doc_len) postings — the inverted-index base table.
    Terms are case-folded whitespace tokens (matching the engine's token
    semantics everywhere else).

    The token array is materialized in its own projection BEFORE the
    explode: putting ``size(toks)`` and ``explode(toks)`` in one select
    re-evaluates the tokenization expression per EXPLODED row (once per
    token, not once per document — measured ~10x on the postings build),
    because the un-materialized expression rides into the Generate
    operator's per-output-row projection. Case-folding lowers the whole
    string (codegen'd) rather than ``transform(..., lower)`` per token
    (interpreted HOF) — ``lower`` maps no codepoint to or from whitespace,
    so the token stream is identical."""
    toks = tokenize_ws(F.lower(F.col(text_col)))
    ex = docs.select(F.col(id_col), toks.alias("_toks")).select(
        F.col(id_col),
        F.size("_toks").alias("doc_len"),
        F.explode("_toks").alias("term"),
    )
    return ex.groupBy(id_col, "doc_len", "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by BM25 (Lucene idf form).

    Returns (id, score) with deterministic (score desc, id asc) ordering.
    Only documents containing at least one query term are scored (standard
    OR semantics); repeated query terms are deduplicated (set semantics —
    weight by query tf upstream if instance weighting is wanted). N and
    avgdl are defined over documents with at least one token, so NULL/empty
    texts neither skew the length normalization (``size(NULL)`` is -1 under
    ANSI-off semantics) nor inflate the idf.
    """
    if not query_terms:
        raise ValueError("query_terms must not be empty")
    terms = sorted({t.lower() for t in query_terms})

    post = term_postings(docs, text_col, id_col)
    # corpus stats via a separate length-only pass (column-pruned scan +
    # keyless agg, no shuffle): deriving them from `post` instead would
    # recompute the whole postings aggregate a second time — Catalyst does
    # not reuse the exchange between the 1-row stats branch and the scoring
    # branch (measured 5x slower). ws_token_count null-propagates, so the
    # `> 0` filter drops NULL and empty texts from N/avgdl.
    from ..functions.text import ws_token_count

    lens = docs.select(ws_token_count(F.col(text_col)).alias("_dl")).filter(F.col("_dl") > 0)
    corpus = lens.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("_dl").alias("avgdl"))
    hit = post.filter(F.col("term").isin(terms))
    df_map = hit.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hit.join(F.broadcast(df_map), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("doc_len") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def rrf_fuse(
    rankings: list,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k0: int = 60,
    top_k: int = 10,
):
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid
    retrieval combiner: each input ranking contributes ``1/(k0 + rank)``
    per document, summed across retrievers; documents surfaced by several
    retrievers rise without any score normalization (ranks are
    scale-free, which is why RRF beats score averaging across a BM25/
    cosine mismatch and stays exactly SQL-replayable — no float score
    comparison crosses engines, only integer ranks).

    ``rankings``: DataFrames each carrying (``id_col``, ``rank_col``)
    (1-based). Returns (id, rrf_score, rnk) — top ``top_k`` by fused
    score, ties broken by id. Scale: inputs are already top-N per
    retriever (tiny); one union + one aggregate."""
    from functools import reduce

    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rankings must not be empty")
    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col))).alias("_c"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = u.groupBy(id_col).agg(F.sum("_c").alias("rrf_score"))
    w = Window.orderBy(F.desc("rrf_score"), id_col)
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(id_col, F.round("rrf_score", 9).alias("rrf_score"), "rnk")
    )
