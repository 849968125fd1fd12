"""Vendored deterministic BPE-ish tokenizer (C1 stand-in).

The reference's primary length function is an HF model tokenizer
(``run_full_evaluation_pipeline.py:348-349``, ``utils/calculate_tokens.py:10-11``
— Qwen BPE). ``transformers`` is not assumed in this runtime, so
``hf_token_count_udf`` historically returned ``None`` and every
tokenizer-backed code path was gated off. This module vendors a tiny
self-contained tokenizer with the same *algorithmic* shape as byte-level
BPE so those paths are exercised for real:

* regex pre-tokenization (GPT-2-style word/number/punct/space classes);
* per pre-token, greedy bottom-up pair merging over character symbols —
  the BPE encode loop — with merge ranks drawn from a deterministic
  SplitMix64 hash of the candidate pair instead of a learned vocab. A pair
  merges only if its rank clears ``merge_threshold``, so average fertility
  lands near real-subword territory (a few chars/token), counts are stable
  across runs/executors/machines, and ``''.join(tokenize(x)) == x``
  (character symbols keep multi-byte text lossless, where raw byte symbols
  would need GPT-2's byte-to-unicode remap table).

It is NOT a model tokenizer and never claims parity with Qwen; it exists so
corpus statistics, context-size predicates, and tokenizer-backed truncation
have a live, tested implementation, while the real HF path stays available
behind the import-try in ``text.hf_token_count_udf``.
"""

from __future__ import annotations

import re

_MASK64 = (1 << 64) - 1

# GPT-2-style pre-tokenization classes (public pattern shape): contractions,
# letter runs, digit runs, non-space-non-alnum runs, whitespace runs.
_PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+", re.UNICODE
)


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


class TinyBPETokenizer:
    """Deterministic character-level BPE-ish tokenizer.

    ``merge_threshold`` is the fraction of candidate pairs considered
    mergeable (rank-hash below threshold): 0 degenerates to characters,
    1 merges every pre-token to a single symbol. The default lands at a
    few chars/token on natural text.
    """

    def __init__(self, merge_threshold: float = 0.6, seed: int = 1234567) -> None:
        self.merge_threshold = merge_threshold
        self.seed = seed
        self._cutoff = int(merge_threshold * (1 << 63))
        self._rank_cache: dict[str, int] = {}

    def _rank(self, merged: str) -> int:
        r = self._rank_cache.get(merged)
        if r is None:
            h = self.seed
            for b in merged.encode("utf-8"):
                h = _splitmix64(h ^ b)
            r = h >> 1  # [0, 2^63)
            self._rank_cache[merged] = r
        return r

    # the merge loop is O(len^2) rank lookups hashing strings of growing
    # length (~O(len^3) bytes hashed): fine for natural pre-tokens (a few
    # chars), pathological for a megabyte base64/minified-JS run that the
    # GPT-2 classes capture as ONE pre-token. Slice such runs into bounded
    # windows first — lossless (slices concatenate back), deterministic,
    # and only affects single-class runs longer than any natural word.
    # CAVEAT (round-7 ADVICE): merges cannot cross window boundaries, so
    # the token SEQUENCE (and count) for a >256-char single-class run
    # differs from an unbounded BPE's. If token-count parity with a
    # reference tokenizer is ever asserted, exclude such runs or replicate
    # this windowing in the oracle.
    _MAX_PRETOKEN = 256
    # the rank cache is keyed by every intermediate merged substring; on
    # the long-lived per-executor UDF singleton it must not grow without
    # bound across a corpus — recomputing a rank is two dozen splitmix
    # rounds, so a flush is cheap
    _MAX_RANK_CACHE = 1_000_000

    def _encode_pretoken(self, pre: str) -> list[str]:
        if len(pre) > self._MAX_PRETOKEN:
            out: list[str] = []
            for a in range(0, len(pre), self._MAX_PRETOKEN):
                out.extend(self._encode_pretoken(pre[a : a + self._MAX_PRETOKEN]))
            return out
        if len(self._rank_cache) > self._MAX_RANK_CACHE:
            self._rank_cache.clear()
        symbols = list(pre)
        while len(symbols) > 1:
            best_i, best_rank = -1, self._cutoff
            for i in range(len(symbols) - 1):
                r = self._rank(symbols[i] + symbols[i + 1])
                if r < best_rank:
                    best_i, best_rank = i, r
            if best_i < 0:
                break
            symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return symbols

    def tokenize(self, text: str) -> list[str]:
        """Subword symbols (lossless: ``''.join`` round-trips the text)."""
        out: list[str] = []
        for pre in _PRETOKEN_RE.findall(text or ""):
            out.extend(self._encode_pretoken(pre))
        return out

    def encode(self, text: str) -> list[int]:
        """Deterministic symbol ids (hash of the symbol's UTF-8 bytes)."""
        ids: list[int] = []
        for pre in _PRETOKEN_RE.findall(text or ""):
            ids.extend(self._rank(s) & 0x7FFFFFFF for s in self._encode_pretoken(pre))
        return ids

    def count(self, text: str) -> int:
        return sum(len(self._encode_pretoken(p)) for p in _PRETOKEN_RE.findall(text or ""))

    def truncate(self, text: str, max_tokens: int) -> str:
        """Tokenizer-backed truncation (F6's HF variant, reference
        runners/run_summarization_ollama.py:9-13): keep the first
        ``max_tokens`` subword symbols, re-joined losslessly."""
        out: list[str] = []
        n = 0
        for pre in _PRETOKEN_RE.findall(text or ""):
            for s in self._encode_pretoken(pre):
                if n >= max_tokens:
                    return "".join(out)
                out.append(s)
                n += 1
        return "".join(out)
