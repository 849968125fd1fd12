"""ROUGE-1/2/L F1 (SURVEY §2.9 M1; evaluate/evaluate_summaries_semantic.py
:132-148).

Pure-deterministic re-implementation of the n-gram-overlap metric family
(rouge_score's English Porter stemmer is a no-op for Vietnamese, so the
rebuild omits stemming; tokenization is whitespace, matching the engine's
default length function).

Two forms:

* ``rouge_scores_udf`` — Arrow-batched pandas UDF returning
  ``struct<rouge1_f, rouge2_f, rougeL_f>`` per (generated, reference) pair.
  ROUGE-L's LCS is a per-pair O(m*n) dynamic program — inherently imperative,
  the canonical pandas-UDF case.
* ``rouge1_f1_expr`` — ROUGE-1 F1 as a *pure Catalyst expression* (multiset
  unigram overlap via map-based counting). JVM-side, oracle-checkable, and
  the 100 TB fast path when only unigram overlap is needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokenize_ws


def _counts(items: list) -> dict:
    d: dict = {}
    for it in items:
        d[it] = d.get(it, 0) + 1
    return d


def _ngram_f1(gen: list[str], ref: list[str], n: int) -> float:
    g = [tuple(gen[i : i + n]) for i in range(len(gen) - n + 1)]
    r = [tuple(ref[i : i + n]) for i in range(len(ref) - n + 1)]
    if not g or not r:
        return 0.0
    gc, rc = _counts(g), _counts(r)
    inter = sum(min(c, rc.get(k, 0)) for k, c in gc.items())
    if inter == 0:
        return 0.0
    return 2.0 * inter / (len(g) + len(r))


def _lcs_len(a: list[str], b: list[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_pair(generated: str, reference: str) -> tuple[float, float, float]:
    """(rouge1_f, rouge2_f, rougeL_f) for one pair — plain Python, testable."""
    g = (generated or "").split()
    r = (reference or "").split()
    r1 = _ngram_f1(g, r, 1)
    r2 = _ngram_f1(g, r, 2)
    lcs = _lcs_len(g, r)
    rl = 2.0 * lcs / (len(g) + len(r)) if lcs else 0.0
    return r1, r2, rl


_ROUGE_SCHEMA = T.StructType(
    [
        T.StructField("rouge1_f", T.DoubleType()),
        T.StructField("rouge2_f", T.DoubleType()),
        T.StructField("rougeL_f", T.DoubleType()),
    ]
)


@F.pandas_udf(_ROUGE_SCHEMA)
def rouge_scores_udf(generated: pd.Series, reference: pd.Series) -> pd.DataFrame:
    rows = [rouge_pair(g, r) for g, r in zip(generated, reference)]
    return pd.DataFrame(rows, columns=["rouge1_f", "rouge2_f", "rougeL_f"])


def _ngram_arr(col, n: int):
    """Token n-gram array (multiset — duplicates kept, unlike dedup's
    distinct shingles) via n-1 zip_with passes."""
    toks = tokenize_ws(col)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    out = F.filter(grams, lambda x: x.isNotNull())
    return F.coalesce(out, F.array().cast("array<string>"))


# Bounded cache book-keeping (ADVICE r8): callers SHOULD release the keyed
# cache via ``operators.unpersist_inputs(result)`` after their action, but a
# long-lived session that never does must not accumulate pinned cache per
# invocation (skip_existing_bloom gates its persist on expected scale; here
# the branch count is fixed at 3, so the persist always pays — the exposure
# is the leak, not the cost). Each call enrolls its cache; past
# _MAX_LIVE_KEYED outstanding entries the oldest is force-released.
# Correctness is unaffected — an evicted entry's branches just recompute.
_MAX_LIVE_KEYED = 8
_LIVE_KEYED: list = []


def _enroll_keyed(keyed) -> None:
    _LIVE_KEYED.append(keyed)
    while len(_LIVE_KEYED) > _MAX_LIVE_KEYED:
        stale = _LIVE_KEYED.pop(0)
        try:
            stale.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release


def rouge_n_f1_df(
    pairs,
    n: int = 1,
    gen_col: str = "g",
    ref_col: str = "r",
    id_cols: tuple[str, ...] = ("doc_id",),
    out_col: str | None = None,
) -> "DataFrame":  # noqa: F821
    """ROUGE-N F1 for a whole pair table via explode + count-join (the
    vectorized batch path): n-gram multiset counts per side, join on
    (id, gram), sum(least(counts)).

    Tradeoff vs ``rouge1_f1_expr``: this shuffles gram rows (3 hash aggs +
    a join) but every operator is whole-stage-codegen'd — ~3x faster than
    the interpreted HOF expression on wide corpora. Prefer the expression
    when adding a column inline without shuffles; prefer this for the
    dedicated metric pass.

    ``id_cols`` need NOT uniquely key the table (the pipeline shape carries
    several (approach, model) rows per doc_id): every branch is re-keyed by
    a per-row number within each id group, so duplicate-id rows each get
    their own correct score — grouping gram counts by ids alone would merge
    different rows' multisets and emit impossible F1 > 1 values. The
    row_number runs over a total order whose leading keys are
    ``xxhash64(gen), xxhash64(ref)`` — 8-byte comparisons instead of
    multi-KB text comparisons in the window sort — with the raw columns as
    final tiebreakers so the order stays fully deterministic even under
    hash collisions. Rows identical in all of (ids, gen, ref) compare equal
    under this order and are interchangeable, so ambiguous numbering among
    them cannot change any row's score. ``keyed`` is persisted so the
    window's exchange+sort runs once, not once per downstream branch;
    callers with long-lived sessions release it after their action via
    ``operators.unpersist_inputs(result)``."""
    from pyspark.sql import Window

    ids = list(id_cols)
    out_col = out_col or f"rouge{n}"
    w = Window.partitionBy(*ids).orderBy(
        F.xxhash64(gen_col).asc(),
        F.xxhash64(ref_col).asc(),
        F.col(gen_col).asc_nulls_first(),
        F.col(ref_col).asc_nulls_first(),
    )
    keyed = pairs.select(*ids, gen_col, ref_col).withColumn(
        "_row", F.row_number().over(w)
    ).persist()
    _enroll_keyed(keyed)
    keys = ids + ["_row"]
    g = (
        keyed.select(*keys, F.explode(_ngram_arr(gen_col, n)).alias("_tok"))
        .groupBy(*keys, "_tok")
        .agg(F.count(F.lit(1)).alias("_cg"))
    )
    r = (
        keyed.select(*keys, F.explode(_ngram_arr(ref_col, n)).alias("_tok"))
        .groupBy(*keys, "_tok")
        .agg(F.count(F.lit(1)).alias("_cr"))
    )
    inter = (
        g.join(r, keys + ["_tok"])
        .groupBy(*keys)
        .agg(F.sum(F.least("_cg", "_cr")).alias("_inter"))
    )
    # gram count is arithmetic on the token count — no need to rebuild the
    # gram arrays just to size them
    def _n_grams(col):
        return F.greatest(F.size(tokenize_ws(col)) - (n - 1), F.lit(0))

    sizes = keyed.select(
        *keys, _n_grams(gen_col).alias("_lg"), _n_grams(ref_col).alias("_lr")
    )
    out = sizes.join(inter, keys, "left")
    f1 = F.when(
        (F.col("_lg") > 0) & (F.col("_lr") > 0) & (F.coalesce("_inter", F.lit(0)) > 0),
        2.0 * F.col("_inter") / (F.col("_lg") + F.col("_lr")),
    ).otherwise(F.lit(0.0))
    result = out.select(*ids, f1.alias(out_col))
    result._persisted_inputs = [keyed]  # unpersist hook for long-lived sessions
    return result


def rouge1_f1_df(
    pairs, gen_col: str = "g", ref_col: str = "r", id_cols: tuple[str, ...] = ("doc_id",)
) -> "DataFrame":  # noqa: F821
    """ROUGE-1 batch path (see rouge_n_f1_df)."""
    return rouge_n_f1_df(pairs, 1, gen_col, ref_col, id_cols, out_col="rouge1")


def rouge1_f1_expr(gen_col: Column | str, ref_col: Column | str) -> Column:
    """ROUGE-1 F1 as a Catalyst expression.

    Multiset intersection via ``aggregate`` over the distinct generated
    tokens, counting ``least(count_in_gen, count_in_ref)`` with
    ``size(filter(...))`` — no shuffle, no Python; runs at scan speed.
    """
    g = tokenize_ws(gen_col)
    r = tokenize_ws(ref_col)

    def overlap(gtoks: Column, rtoks: Column) -> Column:
        uniq = F.array_distinct(gtoks)
        return F.aggregate(
            uniq,
            F.lit(0),
            lambda acc, tok: acc
            + F.least(
                F.size(F.filter(gtoks, lambda x: x == tok)),
                F.size(F.filter(rtoks, lambda x: x == tok)),
            ),
        )

    inter = overlap(g, r)
    denom = F.size(g) + F.size(r)
    return F.when(
        (F.size(g) > 0) & (F.size(r) > 0) & (inter > 0),
        2.0 * inter / denom,
    ).otherwise(F.lit(0.0))
