"""Scalar text functions (SURVEY §2.8) — all JVM-side Column expressions.

Everything here stays inside whole-stage codegen: no Python UDFs. The
reference implements these as per-row Python helpers; on Spark the same
semantics compile to Catalyst expressions that run vectorized on executors.
"""

from .bpe import TinyBPETokenizer
from .pii import PII_PATTERNS, PII_TAGS, pii_counts, redact_pii
from .text import (
    bpe_token_count_udf,
    bpe_truncate_udf,
    clean_thinking_tokens,
    hf_token_count_udf,
    filename_stem,
    normalize_text,
    normalize_whitespace,
    sanitize_model_name,
    tokenize_ws,
    truncate_tokens,
    ws_token_count,
)
from .textstats import (
    char_count,
    char_entropy_batch,
    char_entropy_expr,
    compression_ratio_udf,
    NULL_TEXT_FINGERPRINT,
    doc_fingerprint,
    doc_fingerprint_nullsafe,
    language_id,
    quality_score,
    repetition_stats,
    repetition_stats_batch,
    script_ratios,
    tagged_token_counts,
    word_count,
)
from .vectors import (
    int8_dequantize,
    int8_quantize,
    int8_scale,
    l2_norm,
    l2_normalize,
    quantization_error,
)

__all__ = [
    "TinyBPETokenizer",
    "PII_PATTERNS",
    "PII_TAGS",
    "pii_counts",
    "redact_pii",
    "char_entropy_batch",
    "char_entropy_expr",
    "bpe_token_count_udf",
    "bpe_truncate_udf",
    "hf_token_count_udf",
    "clean_thinking_tokens",
    "filename_stem",
    "normalize_text",
    "normalize_whitespace",
    "sanitize_model_name",
    "repetition_stats",
    "repetition_stats_batch",
    "tagged_token_counts",
    "compression_ratio_udf",
    "script_ratios",
    "int8_dequantize",
    "int8_quantize",
    "int8_scale",
    "l2_norm",
    "l2_normalize",
    "quantization_error",
    "tokenize_ws",
    "truncate_tokens",
    "ws_token_count",
    "char_count",
    "NULL_TEXT_FINGERPRINT",
    "doc_fingerprint",
    "doc_fingerprint_nullsafe",
    "language_id",
    "quality_score",
    "word_count",
]
