"""Core text Column functions.

Parity targets (all cited into ``/root/reference/``):

* ``clean_thinking_tokens``  — ``run_full_evaluation_pipeline.py:34-63``
  (copies in every runner and ``utils/clean_summaries.py:8-21``).
* whitespace token count     — ``runners/run_summarization_ollama_mapreduce.py:58-60``
  (``len(text.split())``).
* token truncation           — ``runners/run_summarization_ollama.py:9-13,86-92``.
* filename stem / model-name sanitize — ``run_full_evaluation_pipeline.py:326,518-519``.

All of these are pure Catalyst expressions — they vectorize in whole-stage
codegen and never cross the Python boundary, so they cost the same per-row at
100 TB as any built-in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference strips five thinking-tag variants with DOTALL+IGNORECASE
# (run_full_evaluation_pipeline.py:42-55). Java regex supports the same
# inline flags.
_THINK_TAGS = ("think", "thinking", "thought", "reasoning", "analysis")


def strip_ws(col: Column | str) -> Column:
    """Python ``str.strip()`` parity: remove leading/trailing whitespace of
    any kind (Spark's ``trim`` only strips ASCII spaces)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def clean_thinking_tokens(col: Column | str) -> Column:
    """Strip ``<think>...</think>`` (and variants) + squeeze blank lines.

    Mirrors ``clean_thinking_tokens`` (run_full_evaluation_pipeline.py:34-63):
    five chained case-insensitive DOTALL removals, then collapse 3+ newlines
    to two, then trim.
    """
    c = F.col(col) if isinstance(col, str) else col
    for tag in _THINK_TAGS:
        c = F.regexp_replace(c, f"(?is)<{tag}>.*?</{tag}>", "")
    c = F.regexp_replace(c, r"\n\s*\n\s*\n", "\n\n")
    return strip_ws(c)


def normalize_whitespace(col: Column | str) -> Column:
    """Collapse all whitespace runs to single spaces and trim.

    Mirrors ``runners/run_summarization_ollama_mapreduce_hierarchical.py:39``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_text(col: Column | str) -> Column:
    """Corpus text normalization (the pre-dedup canonicalization pass every
    web pipeline runs: exact dedup on raw bytes misses mirrors that differ
    only in punctuation codepoints or line endings):

    * CRLF / CR -> LF;
    * C0 control characters (except newline and tab) stripped;
    * curly single/double quotes -> ASCII quote codepoints;
    * en/em/figure/horizontal-bar dashes and the minus sign -> "-";
    * NBSP and the other Unicode space separators -> ASCII space;
    * space/tab runs collapsed to one space, trimmed around newlines.

    Pure ``translate``/``regexp_replace`` expressions: scan-speed,
    RE2-compatible, and replayable in ANSI SQL (the oracle mirrors each
    step). Newlines are PRESERVED (unlike ``normalize_whitespace``) so
    paragraph structure survives for the span-dedup passes downstream."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "\\r\\n?", "\n")
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    c = F.translate(c, "\u2018\u2019\u201a\u201b\u201c\u201d\u201e\u201f", "''''" + '"' * 4)
    c = F.translate(c, "\u2010\u2011\u2012\u2013\u2014\u2015\u2212", "-------")
    c = F.regexp_replace(c, "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]", " ")
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " ?\n ?", "\n")
    return strip_ws(c)


def tokenize_ws(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string>; empty text -> empty array.

    Matches Python ``str.split()``'s no-empty-tokens semantics (the
    reference's length function, run_summarization_ollama_mapreduce.py:
    58-60) over ASCII whitespace. Deliberate contract note: Java/RE2
    ``\\s`` is ASCII-only, so Unicode spaces (NBSP U+00A0, thin space)
    do NOT split here — unlike Python ``str.split()``, which splits all
    Unicode whitespace. ASCII-\\s is kept as the system-wide definition
    because the DuckDB oracle's regexes share it (cross-engine
    replayability is the contract); corpora with NBSP-glued words should
    run ``normalize_text`` first, which maps them to plain spaces."""
    stripped = strip_ws(col)
    return F.when(F.length(stripped) == 0, F.array().cast("array<string>")).otherwise(
        F.split(stripped, r"\s+")
    )


def ws_token_count(col: Column | str) -> Column:
    """``len(text.split())`` as a codegen'd expression (int).

    NULL text -> NULL (not the -1 that legacy ``size(NULL)`` returns under
    the engine's ANSI-off confs) — matching DuckDB's ``len(NULL)`` so
    cross-engine aggregates over corpora with missing text agree. -1 can
    only arise from a NULL array, so ``nullif`` is exact."""
    return F.nullif(F.size(tokenize_ws(col)), F.lit(-1))


def truncate_tokens(col: Column | str, max_tokens: int) -> Column:
    """Keep the first ``max_tokens`` whitespace tokens, re-joined by spaces.

    The reference truncates with a HF tokenizer (runners/run_summarization_
    ollama.py:9-13); the engine's default length function is whitespace
    tokens, so truncation uses the same unit. A tokenizer-backed variant
    belongs in a pandas UDF (see summarize.summarizer) when fidelity to a
    specific model's BPE matters.
    """
    return F.array_join(F.slice(tokenize_ws(col), 1, max_tokens), " ")


def bpe_token_count_udf():
    """Token counting with the vendored deterministic BPE-ish tokenizer
    (functions.bpe) as an Arrow-batched pandas UDF — per-executor singleton
    tokenizer, rank cache warm across batches."""
    from pyspark.sql import functions as _F

    _tok = {}

    @_F.pandas_udf("int")
    def _udf(texts):  # annotation-free: returnType carries the schema
        from .bpe import TinyBPETokenizer

        if "t" not in _tok:
            _tok["t"] = TinyBPETokenizer()
        t = _tok["t"]
        return texts.map(lambda x: t.count(x or ""))

    return _udf


def bpe_truncate_udf(max_tokens: int):
    """Tokenizer-backed truncation (F6's HF-tokenizer variant, reference
    runners/run_summarization_ollama.py:9-13) with the vendored BPE-ish
    tokenizer: encode, keep max_tokens subword symbols, decode losslessly."""
    from pyspark.sql import functions as _F

    _tok = {}

    @_F.pandas_udf("string")
    def _udf(texts):  # annotation-free: returnType carries the schema
        from .bpe import TinyBPETokenizer

        if "t" not in _tok:
            _tok["t"] = TinyBPETokenizer()
        t = _tok["t"]
        return texts.map(lambda x: t.truncate(x or "", max_tokens))

    return _udf


def hf_token_count_udf(model_name: str = "Qwen/Qwen3-4B", fallback: str = "bpe"):
    """HF-tokenizer token counting (C1, run_full_evaluation_pipeline.py
    :348-349) as a pandas UDF with per-executor lazy model init — the real
    model path is gated behind an import-try because ``transformers`` is
    not assumed in the runtime. When unavailable: ``fallback="bpe"``
    (default) returns the vendored deterministic BPE-ish counter
    (functions.bpe) so tokenizer-backed paths stay live; ``fallback="none"``
    restores the old None-gate for callers that prefer ``ws_token_count``
    (the reference itself uses both length functions)."""
    try:
        import transformers  # noqa: F401
    except ImportError:
        return bpe_token_count_udf() if fallback == "bpe" else None

    import pandas as pd
    from pyspark.sql import functions as _F

    _tok = {}

    @_F.pandas_udf("int")
    def _udf(texts: pd.Series) -> pd.Series:
        from transformers import AutoTokenizer

        if "t" not in _tok:  # per-executor singleton
            _tok["t"] = AutoTokenizer.from_pretrained(model_name)
        t = _tok["t"]
        return texts.map(lambda x: len(t.encode(x or "")))

    return _udf


def sanitize_model_name(col: Column | str) -> Column:
    """``model.replace(':','_').replace('.','_')`` (run_full_evaluation_pipeline.py:326)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ":.", "__")


def filename_stem(col: Column | str) -> Column:
    """Extract ``name`` from ``.../name.txt`` (run_full_evaluation_pipeline.py:518-519).

    Python ``Path.stem`` parity for the no-extension cases too: an
    extensionless path (``.../readme``) and a dotfile (``.../.gitignore``)
    return the basename itself — the regex alone returned '' there, which
    collapsed every extensionless file onto one join/group key."""
    c = F.col(col) if isinstance(col, str) else col
    stem = F.regexp_extract(c, r"([^/]+)\.[^./]+$", 1)
    return F.when(stem == "", F.element_at(F.split(c, "/"), -1)).otherwise(stem)
