"""Embedding-vector preprocessing: norms, normalization, int8 quantization.

The embedding side of a training/retrieval pipeline stores billions of
vectors; fp32 is 4x the bytes of int8, and most ANN indexes want unit-norm
inputs. These are pure Catalyst array expressions (zip_with / transform /
aggregate) — scan-speed, no Python, no shuffle — matching the engine's
policy of keeping per-row math JVM-side.

Quantization uses explicit ``floor(x * scale + 0.5)`` rounding rather than
``round()``: round-half semantics differ across engines (half-up vs
half-even vs half-away), and the DuckDB oracle replays this arithmetic
bit-for-bit, so the rounding must be written out in primitives both engines
define identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def l2_norm(col: Column | str) -> Column:
    v = _c(col)
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _broadcast_scalar(s: Column, n: Column) -> Column:
    """Evaluate a per-row scalar ONCE and repeat it: referencing an
    aggregate expression inside a HOF lambda re-evaluates the full O(d)
    aggregate per ELEMENT (Catalyst neither codegens nor CSEs across the
    lambda boundary) — O(d^2) per vector, ~1000x the arithmetic at
    1024-dim. array_repeat materializes the value once."""
    return F.array_repeat(s, n)


def l2_normalize(col: Column | str) -> Column:
    """Unit-norm copy of the vector; zero vectors stay zero (no NaNs)."""
    v = _c(col)
    n = l2_norm(v)
    unit = F.zip_with(
        v, _broadcast_scalar(n, F.size(v)), lambda x, nn: x / nn
    )
    return F.when(n > 0, unit).otherwise(v)


def int8_scale(col: Column | str) -> Column:
    """Per-vector symmetric quantization scale: 127 / max(|x|) (0 -> 1.0 so
    zero vectors round-trip to zeros)."""
    v = _c(col)
    mx = F.array_max(F.transform(v, F.abs))
    return F.when(mx > 0, 127.0 / mx).otherwise(F.lit(1.0))


def int8_quantize(col: Column | str, scale: Column) -> Column:
    """int8 codes via floor(x*scale + 0.5) — engine-portable rounding.
    Codes are bounded to [-127, 127] by the symmetric scale, so they cast
    to tinyint — the 1-byte element the module's 4x-over-fp32 storage
    claim is about (a 4-byte 'int' would deliver none of it). ``scale``
    may be an expression (e.g. ``int8_scale(v)``): it is evaluated once
    per row, not once per element."""
    v = _c(col)
    return F.zip_with(
        v,
        _broadcast_scalar(scale, F.size(v)),
        lambda x, s: F.floor(x * s + 0.5).cast("tinyint"),
    )


def int8_dequantize(codes: Column, scale: Column) -> Column:
    c = _c(codes)
    return F.zip_with(
        c, _broadcast_scalar(scale, F.size(c)), lambda q, s: q.cast("double") / s
    )


def quantization_error(col: Column | str, scale: Column) -> Column:
    """max |x - dequant(quant(x))| — the reconstruction error bound the
    storage layer monitors (should be <= 0.5/scale everywhere)."""
    v = _c(col)
    deq = int8_dequantize(int8_quantize(v, scale), scale)
    return F.array_max(F.zip_with(v, deq, lambda a, b: F.abs(a - b)))
