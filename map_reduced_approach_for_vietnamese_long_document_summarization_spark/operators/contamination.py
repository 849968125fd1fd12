"""Benchmark decontamination: n-gram containment of eval docs in train docs.

Before training, pipelines must find eval/benchmark documents that leak into
the training split (decontamination — the GPT-3/PaLM appendix procedure): for
each test doc, the fraction of its n-gram shingles that also appear in some
train doc. This is the bipartite variant of the dedup family's inverted-index
join (``operators/dedup.py:ngram_jaccard_pairs``), and reuses its shingle
expression and stop-shingle cap.

Scale design mirrors the self-join case: candidate generation goes through a
shingle equi-join (never all test×train pairs); ``max_doc_freq`` caps the
*train-side* posting list so one boilerplate shingle shared by millions of
train docs can't explode the join (the cap makes containment a documented
lower bound, exactly like the Jaccard operator). The metric is containment
|T∩R| / |T| — asymmetric on purpose: a tiny test doc fully inside a huge
train doc is 100% contaminated, which Jaccard would hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_expr


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_doc_freq: int | None = None,
    threshold: float | None = None,
    top_k: int | None = None,
    pair_gen: str = "posting",
) -> DataFrame:
    """(test_id, train_id, n_common, test_shingles, containment) for every
    test×train pair sharing at least one shingle.

    ``containment`` = shared distinct shingles / test doc's distinct
    shingles. ``threshold`` keeps pairs at or above a containment floor;
    ``top_k`` keeps the top pairs by (containment desc, test_id, train_id)
    — fully deterministic tiebreakers.

    ``pair_gen`` picks the candidate-pair plan (identical output — pinned
    by test): ``"posting"`` (default) is the posting-row equi-join;
    ``"grouped"`` groups EACH side by shingle and joins one-row-per-shingle
    posting lists (the shape that won -33% on the SELF-join in
    ``ngram_jaccard_pairs``). MEASURED AND REJECTED as default here (r14,
    plans/r14/probe_contamination_pairgen.json, 6-round interleaved A/B,
    identical results): +6% — in the bipartite case the small test side
    broadcasts, so the posting join is already shuffle-light and the
    grouped arm only adds the per-side groupBy exchanges. Kept as the
    rerunnable experiment arm for corpora whose test side is NOT small.
    """
    if pair_gen not in ("grouped", "posting"):
        raise ValueError(f"unknown pair_gen {pair_gen!r}")
    tsh = test.select(
        F.col(id_col).alias("test_id"), F.explode(shingles_expr(text_col, shingle_n)).alias("sh")
    ).persist()
    rsh = train.select(
        F.col(id_col).alias("train_id"), F.explode(shingles_expr(text_col, shingle_n)).alias("sh")
    )
    sizes = tsh.groupBy("test_id").agg(F.count(F.lit(1)).alias("test_shingles"))
    if pair_gen == "grouped":
        rlists = rsh.groupBy("sh").agg(F.collect_list("train_id").alias("_r_ids"))
        if max_doc_freq is not None:
            rlists = rlists.filter(F.size("_r_ids") <= max_doc_freq)
        tlists = tsh.groupBy("sh").agg(F.collect_list("test_id").alias("_t_ids"))
        pairs = (
            tlists.join(rlists, "sh")
            .select(F.explode("_t_ids").alias("test_id"), "_r_ids")
            .select("test_id", F.explode("_r_ids").alias("train_id"))
            .groupBy("test_id", "train_id")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        if max_doc_freq is not None:
            rare = (
                rsh.groupBy("sh")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= max_doc_freq)
                .select("sh")
            )
            rsh = rsh.join(rare, "sh")
        pairs = (
            tsh.join(rsh, "sh")
            .groupBy("test_id", "train_id")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    out = pairs.join(sizes, "test_id").withColumn(
        "containment", F.round(F.col("n_common") / F.col("test_shingles"), 6)
    )
    if threshold is not None:
        out = out.filter(F.col("containment") >= threshold)
    if top_k is not None:
        out = out.orderBy(
            F.desc("containment"), F.asc("test_id"), F.asc("train_id")
        ).limit(top_k)
    # tsh feeds two branches (sizes + pairs); the persist avoids re-building
    # test-side shingles twice. Long-lived sessions should release it after
    # the consuming action via operators.unpersist_inputs(out).
    out._persisted_inputs = [tsh]
    return out


def embedding_contamination(
    test: DataFrame,
    train: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
) -> DataFrame:
    """Semantic decontamination: (test_id, train_id) for every test x train
    vector pair whose cosine similarity clears ``threshold`` — the
    embedding-space twin of ``ngram_contamination`` that catches
    paraphrase-level leakage n-gram overlap misses.

    Cosines are rounded to 6 decimals BEFORE thresholding (the repo-wide
    cross-engine convention: a pair within an ulp of the threshold must not
    flip between engines — so a raw cosine of 0.2999996 at threshold 0.3 IS
    flagged). Zero vectors are dropped from both sides (no NaN ever reaches
    the filter), and magnitudes are irrelevant by construction.

    Scale: the test split is the small side by convention (e.g. 10% of an
    80/10/10 split) and is broadcast; the train side never shuffles. Each
    side is unit-normalized ONCE per vector before the pair stage via the
    ``functions/vectors`` array_repeat form — a ``withColumn("_n", ...)``
    referenced inside the division lambda looks evaluated-once but is NOT:
    CollapseProject inlines it into the lambda and the O(d) norm aggregate
    re-runs per ELEMENT (the `_broadcast_scalar` trap, O(d^2) per vector
    on the full train corpus). The naive cosine-per-pair form is worse
    still: both norms re-evaluated once per PAIR.
    """
    from ..functions.vectors import l2_norm, l2_normalize

    def _unit(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(out_id),
            F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
        )
        return v.filter(l2_norm("_v") > 0).select(
            out_id, l2_normalize("_v").alias(out_vec)
        )

    t = _unit(test, "test_id", "tu")
    r = _unit(train, "train_id", "ru")
    dot = F.aggregate(
        F.zip_with("tu", "ru", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    return (
        F.broadcast(t)
        .crossJoin(r)
        .filter(F.round(dot, 6) >= threshold)
        .select("test_id", "train_id")
    )
