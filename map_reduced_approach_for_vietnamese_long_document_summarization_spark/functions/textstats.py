"""Text-analysis operators for large-scale training-data pipelines.

North-star extensions beyond the reference surface (BASELINE.json): quality
scoring, language ID, token/char/word counting, document fingerprinting.
All are Catalyst expressions (JVM-side, codegen'd) so they run at full scan
speed on a 100 TB corpus — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import normalize_whitespace, tokenize_ws, ws_token_count


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def word_count(col: Column | str) -> Column:
    return ws_token_count(col)


# Tiny per-language stopword lists for the n-gram/stopword-ratio language-ID
# heuristic. Deliberately small: the point is a cheap scan-speed classifier,
# not fastText parity.
_LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
    "vi": ("và", "là", "của", "không", "có", "một", "những", "được"),
}


def _stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Count tokens that appear in a stopword list (array intersection size)."""
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit_arr, F.lower(t))))


def language_id(col: Column | str, languages: tuple[str, ...] = ("en", "de", "fr", "es", "vi")) -> Column:
    """Stopword-ratio language ID: argmax over per-language stopword hits.

    Ties broken by the fixed language order (first wins); zero hits -> 'und'.
    """
    tokens = tokenize_ws(col)
    scores = [
        F.struct(
            _stopword_hits(tokens, _LANG_STOPWORDS[lang]).alias("hits"),
            F.lit(len(languages) - i).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(languages)
    ]
    best = F.array_max(F.array(*scores))
    # NULL text maps to 'und' DELIBERATELY (unlike script_ratios, which
    # keeps NULL): language_id feeds reporting rollups where 'no text' and
    # 'no stopword hit' belong in the same undetermined bucket, and the
    # DuckDB oracle pins this choice — callers needing the distinction
    # filter on text IS NULL first
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Heuristic doc-quality score in [0,1] from cheap surface statistics.

    Components (equal weight):
      * length score   — linear ramp up to 1.0 at >= 50 chars; deliberately
        NO upper cap (over-length boilerplate is ``repetition_stats``' job,
        and the oracle pins this exact formula)
      * token score    — 1 if mean token length in [3, 12]
      * alpha ratio    — fraction of non-space chars that are alphanumeric
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_tokens = ws_token_count(c)
    compact = F.regexp_replace(c, r"\s+", "")
    n_compact = F.length(compact)
    n_alpha = F.length(F.regexp_replace(compact, r"[^\p{L}\p{N}]", ""))

    length_score = F.least(F.lit(1.0), n_chars.cast("double") / F.lit(50.0))
    mean_tok_len = F.when(n_tokens > 0, n_compact.cast("double") / n_tokens).otherwise(F.lit(0.0))
    token_score = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_compact > 0, n_alpha.cast("double") / n_compact).otherwise(F.lit(0.0))
    return (length_score + token_score + alpha_ratio) / F.lit(3.0)


def repetition_stats(col: Column | str) -> Column:
    """Gopher/RefinedWeb-style repetition filters as one struct column:

    * ``dup_token_ratio``  — 1 - distinct/total tokens (case-folded)
    * ``dup_bigram_ratio`` — 1 - distinct/total word bigrams
    * ``top_token_ratio``  — share of the single most frequent token

    All-Catalyst array expressions, so the filters run at scan speed next to
    ``quality_score``. ``top_token_ratio`` counts occurrences per *distinct*
    token via a higher-order filter — O(distinct * len) per document, which
    is bounded because training-pipeline docs are length-capped upstream;
    for uncapped corpora use an explode+groupBy twin (same trade the ROUGE
    batch path makes, metrics/rouge.py). Empty/NULL text yields zeros."""
    from ..operators.dedup import shingles_expr

    toks = F.transform(tokenize_ws(col), F.lower)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    n_bg = F.greatest(n - 1, F.lit(0))
    nd_bg = F.size(shingles_expr(col, n=2))
    top = F.array_max(
        F.transform(F.array_distinct(toks), lambda d: F.size(F.filter(toks, lambda t: t == d)))
    )
    zero = F.lit(0.0)
    return F.struct(
        F.when(n > 0, 1.0 - nd.cast("double") / n).otherwise(zero).alias("dup_token_ratio"),
        F.when(n_bg > 0, 1.0 - nd_bg.cast("double") / n_bg).otherwise(zero).alias("dup_bigram_ratio"),
        F.when(n > 0, top.cast("double") / n).otherwise(zero).alias("top_token_ratio"),
    )


def tagged_token_counts(df, id_col: str = "doc_id", text_col: str = "text"):
    """Shared explode for the token-statistics family: one pass over the
    corpus producing ``(id_col, _k, _v, _c)`` — per-document counts of
    case-folded tokens (``_k`` = 1, with multiplicity in ``_c``) and of
    distinct bigram shingles (``_k`` = 2, ``_c`` = 1 each).

    The ``_k`` = 1 rows ARE a term-postings table (``_v`` = term, ``_c`` =
    tf), so one persisted frame feeds both ``repetition_stats_batch`` (via
    ``counts=``) and ``unigram_logprob`` (via ``postings=``) —
    ``corpus_quality_report`` shares it to scan and explode the corpus once
    instead of once per signal (guide §2.4: don't recompute what you
    already shuffled for).

    Tokens are case-folded at the STRING level (``tokenize_ws(lower(text))``
    — codegen) rather than per token (``transform(..., lower)`` — one
    interpreted HOF pass per token); ``lower`` maps no codepoint to or from
    whitespace, so the token stream is identical (SCALE.md). No scalar
    column rides through the generator — project collapsing would
    re-evaluate it per exploded row — and the bigram branch explodes in the
    same pass as tagged values instead of a second corpus scan."""
    from ..operators.dedup import shingles_expr

    toks = tokenize_ws(F.lower(F.col(text_col)))
    tagged = F.concat(
        F.transform(toks, lambda t: F.struct(F.lit(1).alias("k"), t.alias("v"))),
        F.transform(
            shingles_expr(text_col, n=2), lambda s: F.struct(F.lit(2).alias("k"), s.alias("v"))
        ),
    )
    ex = df.select(F.col(id_col), F.explode(tagged).alias("_e")).select(
        id_col, F.col("_e.k").alias("_k"), F.col("_e.v").alias("_v")
    )
    return ex.groupBy(id_col, "_k", "_v").agg(F.count(F.lit(1)).alias("_c"))


def repetition_stats_batch(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts=None,
    retain_missing: bool = True,
):
    """DataFrame twin of ``repetition_stats`` for uncapped corpora: the
    top-token count goes through explode + groupBy (hash aggregates, fully
    codegen'd, map-side combinable) instead of the O(distinct * len)
    interpreted higher-order filter — the same trade the ROUGE batch path
    makes. One token-explode shuffle; the cheap array ratios stay row-local.
    Returns (id_col, dup_token_ratio, dup_bigram_ratio, top_token_ratio).

    ``id_col`` must be unique: rows sharing an id would have their token
    pools merged by the groupBy (the per-row Column twin does not merge) —
    dedupe or add a surrogate key first.

    ``counts`` accepts a (persisted) ``tagged_token_counts`` frame to share
    the corpus explode with other signals; ``retain_missing=False`` skips
    the docs-id join that restores token-less documents as zero-ratio rows
    — for callers (``corpus_quality_report``) that re-attach the frame with
    their own retaining join anyway.
    """
    ex = counts if counts is not None else tagged_token_counts(df, id_col, text_col)
    zero = F.lit(0.0)
    tok = F.col("_k") == 1
    stats = (
        ex.groupBy(id_col)
        .agg(
            F.sum(F.when(tok, F.col("_c"))).alias("_n"),
            F.sum(F.when(tok, 1)).alias("_nd"),
            F.max(F.when(tok, F.col("_c"))).alias("_topc"),
            F.sum(F.when(~tok, 1)).alias("_ndbg"),
        )
    )
    # empty/NULL-text docs emit no tokens: restore them with zero ratios
    # (the ratio expressions below coalesce the same way whether a row is
    # NULL from the retaining left join or — with retain_missing=False —
    # simply absent until the caller's own left join re-attaches it)
    src = df.select(id_col).join(stats, id_col, "left") if retain_missing else stats
    return src.select(
        id_col,
        F.coalesce(1.0 - F.col("_nd") / F.col("_n"), zero).alias("dup_token_ratio"),
        F.coalesce(
            F.when(F.col("_n") > 1, 1.0 - F.coalesce("_ndbg", F.lit(0)) / (F.col("_n") - 1)),
            zero,
        ).alias("dup_bigram_ratio"),
        F.coalesce(F.col("_topc") / F.col("_n"), zero).alias("top_token_ratio"),
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized text.

    Used by exact dedup (operators.dedup) — normalizing first makes the
    fingerprint robust to formatting-only differences.
    """
    return F.md5(normalize_whitespace(col))


#: Sentinel dedup key for NULL text (see ``doc_fingerprint_nullsafe``).
#: Cannot collide with a real fingerprint: md5 hex is exactly 32 chars.
NULL_TEXT_FINGERPRINT = "<null-text>"


def doc_fingerprint_nullsafe(col: Column | str) -> Column:
    """``doc_fingerprint`` with a sentinel for NULL text — the JOIN-safe
    variant. ``doc_fingerprint(NULL)`` is NULL, and NULL keys never match
    in equi/anti-joins, so an exact-text gate built on the raw fingerprint
    silently passes every NULL-text doc through (they also evade
    MinHash-based gates, whose sentinel signatures are excluded by
    design). Use THIS when the fingerprint is a join key; use the raw
    variant when NULL-ness itself carries meaning (``corpus_diff`` keeps
    explicit presence markers instead)."""
    return F.coalesce(doc_fingerprint(col), F.lit(NULL_TEXT_FINGERPRINT))


def char_entropy_expr(col: Column | str) -> Column:
    """Column twin of ``char_entropy_batch`` — the same per-row run-length
    arithmetic as one expression, for callers (``corpus_quality_report``)
    that fuse entropy into an existing scan-side projection instead of
    paying a second corpus scan plus an id join for it. All semantics
    (NULL/empty -> 0.0, round(6), code-point counting) are the batch
    function's; see its docstring for the design rationale and the
    measured-rejected variants."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.coalesce(c, F.lit(""))
    runs = F.regexp_extract_all(
        F.array_join(F.array_sort(F.split(s, "")), ""),
        F.lit(r"(?s)(.)\1*"),
        0,
    )
    counts = F.transform(runs, lambda r: F.length(r).cast("double"))
    clogc = F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * F.log2(x))
    n = F.length(s)
    return (
        F.when(n > 0, F.round(F.log2(n) - clogc / n, 6)).otherwise(F.lit(0.0))
    )


def char_entropy_batch(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon character entropy (bits/char) — the cheap
    gibberish/degenerate-text signal quality pipelines layer next to the
    Gopher repetition rules: binary blobs and keyboard mash score far from
    the ~4 bits/char of natural text, single-char floods score ~0.

    Computed as ``log2(n) - sum(c_i * log2(c_i)) / n`` over per-character
    counts ``c_i`` — the algebraic form whose only float sum is over the
    ~|alphabet| distinct characters, not all n. Characters are compared
    case-sensitively on the raw text (entropy is about the byte stream a
    tokenizer will see, not normalized words).

    Returns ``(id_col, n_chars, entropy)`` with entropy rounded to 6
    (engine-portable; the handful of same-magnitude log terms keeps
    double-precision error ~1e-15, far under the rounding step — the float
    sum's evaluation order is therefore also irrelevant, so the per-row
    array-order sum below matches an agg-order oracle after rounding).
    NULL and empty text score 0.0 with n_chars 0.

    Scale: ZERO shuffle — a document is one row, so the whole statistic is
    a per-row expression (round-10 plan audit; the prior form exploded
    every char into a (doc, char) hash aggregate + per-doc rollup + join
    back: three exchanges carrying n rows per doc across the wire for a
    value computable where the row already sits — at 100 TB the difference
    between a scan and a shuffle of the corpus's entire character stream).
    Per-char counts come from RUN LENGTHS over the SORTED character
    stream, extracted by a compiled-JVM regex instead of interpreted HOF
    element work: sort the chars (one JVM ``array_sort``), join back to a
    string, and ``regexp_extract_all('(?s)(.)\\1*')`` — the backreference
    splits the sorted string into one match per distinct char, so the only
    interpreted HOF passes are O(|alphabet|) per row (length-of-run
    ``transform`` + the ``c*log2(c)`` fold). Two rejected variants, both
    measured at sf0.1: ``array_distinct`` x ``filter`` is O(|alphabet| x n)
    interpreted (3x slower than the explode); an O(n) interpreted
    boundary-scan over ``sequence`` still pays ~1us per element (1.4x
    slower). ``(?s)`` matters (sorted text can contain newlines, which
    bare ``.`` skips); Java regex is code-point aware, so astral chars
    count once, agreeing with ``length()`` and the code-point oracle.
    ``n_chars`` is simply ``length(text)`` (the split keeps every char).
    Note the scan parallelism caveat: at small SF a single parquet file is
    one input split, so this runs on one core where the exploded form's
    shuffles fanned out to 32 — at real scale the scan has thousands of
    splits and zero-shuffle wins unconditionally. Unlike the exploded
    form, ``id_col`` need not be unique — every input row scores its own
    text."""
    s = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.select(
        F.col(id_col),
        F.length(s).alias("_n"),
        F.regexp_extract_all(
            F.array_join(F.array_sort(F.split(s, "")), ""),
            F.lit(r"(?s)(.)\1*"),
            0,
        ).alias("_runs"),
    )
    counts = F.transform(F.col("_runs"), lambda r: F.length(r).cast("double"))
    staged = staged.select(
        id_col,
        "_n",
        F.aggregate(counts, F.lit(0.0), lambda a, c: a + c * F.log2(c)).alias(
            "_clogc"
        ),
    )
    return staged.select(
        F.col(id_col),
        F.col("_n").cast("long").alias("n_chars"),
        F.when(
            F.col("_n") > 0, F.round(F.log2("_n") - F.col("_clogc") / F.col("_n"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("entropy"),
    )


def script_ratios(col: Column | str) -> Column:
    """Unicode-script composition of a document as one struct column:
    ``(n_letters, latin_ratio, cyrillic_ratio, han_ratio)`` — the signal a
    multilingual curation pipeline routes on BEFORE language ID (script is
    deterministic where stopword-based lang ID needs enough tokens; a
    "vi"-labeled doc that is 90% Han is mislabeled upstream).

    Counts are ``length`` after deleting the complement class — four
    codegen'd regexp_replace passes, scan-speed, zero shuffle. Ratios are
    over LETTERS (``\\p{L}``), so digits/punct/whitespace dilute nothing;
    a letterless doc reports 0.0 everywhere. Java spells the classes
    ``\\p{IsLatin}``; RE2 (the DuckDB oracle) spells them ``\\p{Latin}`` —
    same script sets."""
    c = F.col(col) if isinstance(col, str) else col

    def n(cls: str) -> Column:
        return F.length(F.regexp_replace(c, f"[^\\p{{{cls}}}]", ""))

    letters = n("L")
    # NULL text must yield NULL ratios (n_letters is NULL — ratios of 0.0
    # next to it would misreport NULL docs as "letterless" AND diverge from
    # the SQL oracle's NULL arithmetic); only a genuinely letterless doc
    # reads 0.0
    ratio = lambda x: (  # noqa: E731
        F.when(letters > 0, F.round(x / letters, 6))
        .when(letters.isNotNull(), F.lit(0.0))
    )
    return F.struct(
        letters.alias("n_letters"),
        ratio(n("IsLatin")).alias("latin_ratio"),
        ratio(n("IsCyrillic")).alias("cyrillic_ratio"),
        ratio(n("IsHan")).alias("han_ratio"),
    )


def compression_ratio_udf(level: int = 6):
    """zlib compression ratio per document (compressed/raw bytes) as an
    Arrow-batched pandas UDF — the classic redundancy proxy (used alongside
    the Gopher repetition ratios): boilerplate and templated text compress
    far below natural prose (~0.3 vs ~0.6 on web text), random/encrypted
    blobs sit near 1.0. Rows-only by nature (no SQL engine ships zlib);
    deterministic for a fixed zlib version and ``level``. Empty/NULL text
    reports NULL (no bytes, no ratio)."""
    from pyspark.sql import functions as _F

    @_F.pandas_udf("double")
    def _udf(texts):  # annotation-free: returnType carries the schema
        import zlib

        import pandas as pd

        out = []
        for t in texts:
            if not t:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(len(zlib.compress(raw, level)) / len(raw))
        return pd.Series(out, dtype="float64")

    return _udf
