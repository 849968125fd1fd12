"""BERTScore (SURVEY §2.9 M2) — greedy-match token P/R/F1.

The reference computes BERTScore over (generated, reference) summary pairs
and reports batch-mean precision/recall/F1
(``evaluate/evaluate_summaries_semantic.py:150-166``). The algorithm shape is:
embed every token of both sides, compute the pairwise cosine matrix, take
each candidate token's best match (greedy max) for precision and each
reference token's best match for recall, mean over tokens, harmonic-mean F1.

This module implements that shape with a **pluggable token encoder**:

* ``bertscore_greedy_pairs`` — the general path. An encoder callable maps a
  token batch to unit vectors; greedy matching runs in an Arrow-batched
  pandas UDF (one numpy matmul per pair — no Python-per-token cost). The
  deterministic default (``hashed_trigram_encoder``) needs no model
  downloads, so the full pipeline is runnable and testable offline; the
  real ``bert-score`` library remains available through
  ``semantic.bert_score_encoder`` when installed.
* ``bertscore_hard_match`` — the Catalyst fast path / oracle twin: with a
  one-hot-bucket encoder (every token embeds to a basis vector keyed by a
  rolling hash), the cosine kernel degenerates to exact bucket equality and
  the whole metric becomes a per-row JVM expression — zero shuffle,
  scan-speed at 100 TB, and SQL-expressible for the DuckDB oracle.

The two paths agree exactly when ``bertscore_greedy_pairs`` is given
``one_hot_bucket_encoder`` (equivalence-tested in tests/test_metrics.py).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_ws

#: modulus of the polynomial rolling hash (small enough that
#: ``acc * 31 + codepoint`` stays far below 2^63 — safe under ANSI mode)
_HASH_MOD = 1_000_003
#: default bucket count for the hard-match kernel
_N_BUCKETS = 4093


def token_bucket_expr(tok: Column, n_buckets: int = _N_BUCKETS) -> Column:
    """Rolling-hash bucket of a token: ``h = fold(h*31 + codepoint) %
    1000003`` then ``% n_buckets``. Pure Catalyst; the same arithmetic is
    expressible in DuckDB (list_reduce + unicode), which is what makes the
    hard-match metric oracle-checkable."""
    # drop empty elements: Spark 3.x's split(tok, "") keeps a trailing ""
    # (Java split semantics) whose ascii() is 0 — one extra fold step that
    # would silently diverge from _py_token_bucket on the 3.5 support floor;
    # Spark 4 emits no empties, so the filter is a no-op there
    codes = F.transform(
        F.filter(F.split(tok, ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"),
    )
    h = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % _HASH_MOD
    )
    return h % n_buckets


def _py_token_bucket(token: str, n_buckets: int = _N_BUCKETS) -> int:
    """Python twin of ``token_bucket_expr`` (used by the one-hot encoder)."""
    h = 0
    for ch in token:
        h = (h * 31 + ord(ch)) % _HASH_MOD
    return h % n_buckets


def bertscore_hard_match(
    df: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    n_buckets: int = _N_BUCKETS,
) -> DataFrame:
    """Greedy-match P/R/F1 with the hard (exact-bucket) kernel, as three
    appended columns ``bert_precision/bert_recall/bert_f1``.

    Per row: bucket both token lists, precision = fraction of candidate
    tokens whose bucket appears among reference buckets (that IS the greedy
    max under a one-hot encoder), recall symmetric, F1 harmonic. All
    per-row array expressions — the metric adds zero shuffles to whatever
    plan produced the pairs."""
    clash = {"_cb", "_rb", "bert_precision", "bert_recall", "bert_f1"} & set(df.columns)
    if clash:
        raise ValueError(
            f"bertscore_hard_match reserves columns {sorted(clash)}; rename "
            "them first (an existing one would be silently overwritten and "
            "the scratch columns dropped)"
        )
    cb = F.transform(tokenize_ws(cand_col), lambda t: token_bucket_expr(t, n_buckets))
    rb = F.transform(tokenize_ws(ref_col), lambda t: token_bucket_expr(t, n_buckets))
    out = df.withColumn("_cb", cb).withColumn("_rb", rb)
    matched_c = F.size(F.filter(F.col("_cb"), lambda b: F.array_contains(F.col("_rb"), b)))
    matched_r = F.size(F.filter(F.col("_rb"), lambda b: F.array_contains(F.col("_cb"), b)))
    p = F.when(F.size("_cb") > 0, matched_c / F.size("_cb")).otherwise(F.lit(0.0))
    r = F.when(F.size("_rb") > 0, matched_r / F.size("_rb")).otherwise(F.lit(0.0))
    out = out.withColumn("bert_precision", p).withColumn("bert_recall", r)
    f1 = F.when(
        F.col("bert_precision") + F.col("bert_recall") > 0,
        2 * F.col("bert_precision") * F.col("bert_recall")
        / (F.col("bert_precision") + F.col("bert_recall")),
    ).otherwise(F.lit(0.0))
    return out.withColumn("bert_f1", f1).drop("_cb", "_rb")


def hashed_trigram_encoder(dim: int = 64) -> Callable[[list[str]], np.ndarray]:
    """Deterministic dependency-free token encoder: hashed character
    trigrams of ``^token$`` with signed counts, L2-normalized. Similar
    surface forms share trigrams, so the kernel is genuinely soft (unlike
    the one-hot bucket kernel) while staying reproducible across runs and
    executors — the offline stand-in for a sentence-transformer."""

    def encode(tokens: list[str]) -> np.ndarray:
        out = np.zeros((len(tokens), dim), dtype=np.float64)
        for i, tok in enumerate(tokens):
            padded = f"^{tok}$"
            for j in range(max(len(padded) - 2, 1)):
                g = padded[j : j + 3]
                h = 0
                for ch in g:
                    h = (h * 31 + ord(ch)) % _HASH_MOD
                sign = 1.0 if (h >> 1) % 2 == 0 else -1.0
                out[i, h % dim] += sign
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out

    return encode


def one_hot_bucket_encoder(
    n_buckets: int = _N_BUCKETS,
) -> Callable[[list[str]], np.ndarray]:
    """Token -> basis vector e_{bucket(token)}. Under this encoder the
    greedy cosine max is 1 iff the other side contains a same-bucket token,
    so ``bertscore_greedy_pairs`` reproduces ``bertscore_hard_match``
    exactly (the equivalence test's bridge between the two paths)."""

    def encode(tokens: list[str]) -> np.ndarray:
        out = np.zeros((len(tokens), n_buckets), dtype=np.float64)
        for i, tok in enumerate(tokens):
            out[i, _py_token_bucket(tok, n_buckets)] = 1.0
        return out

    return encode


def bertscore_greedy_pairs(
    df: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    encoder: Callable[[list[str]], np.ndarray] | None = None,
) -> DataFrame:
    """Greedy-match BERTScore with an arbitrary token encoder, as appended
    ``bert_precision/bert_recall/bert_f1`` columns.

    Arrow-batched pandas UDF; per pair the work is one ``C @ R.T`` matmul
    over the (few-hundred-token max) summary pair — the same greedy-match
    reduction as ``bert_score.score`` (reference EVAL:150-166), with the
    embedding model swapped for ``encoder``. Scale shape: embarrassingly
    parallel per row, zero shuffle; the encoder closure ships once per
    executor in the UDF, not per row."""
    clash = {"_bs", "bert_precision", "bert_recall", "bert_f1"} & set(df.columns)
    if clash:
        raise ValueError(
            f"bertscore_greedy_pairs reserves columns {sorted(clash)}; "
            "rename them first"
        )
    enc = encoder or hashed_trigram_encoder()

    @F.pandas_udf("bert_precision double, bert_recall double, bert_f1 double")
    def _score(cand, ref):  # type: ignore[no-untyped-def]
        import pandas as pd

        rows = []
        for c_text, r_text in zip(cand, ref):
            c_toks = (c_text or "").split()
            r_toks = (r_text or "").split()
            if not c_toks or not r_toks:
                p = r = 0.0
            else:
                sims = enc(c_toks) @ enc(r_toks).T
                p = float(sims.max(axis=1).mean())
                r = float(sims.max(axis=0).mean())
            f1 = (2 * p * r / (p + r)) if (p + r) > 0 else 0.0
            rows.append((p, r, f1))
        return pd.DataFrame(rows, columns=["bert_precision", "bert_recall", "bert_f1"])

    scored = df.withColumn("_bs", _score(F.col(cand_col), F.col(ref_col)))
    return (
        scored.withColumn("bert_precision", F.col("_bs.bert_precision"))
        .withColumn("bert_recall", F.col("_bs.bert_recall"))
        .withColumn("bert_f1", F.col("_bs.bert_f1"))
        .drop("_bs")
    )


def bertscore_corpus_mean(scored: DataFrame) -> DataFrame:
    """Batch means exactly as the reference reports them
    (EVAL:158-163 returns ``float(P.mean())`` etc.)."""
    return scored.agg(
        F.round(F.avg("bert_precision"), 6).alias("bert_precision"),
        F.round(F.avg("bert_recall"), 6).alias("bert_recall"),
        F.round(F.avg("bert_f1"), 6).alias("bert_f1"),
    )
