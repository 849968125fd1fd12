"""Property tests for the round-3 lexical operators — pure-Python replicas
of the TF-IDF / unigram-LM / feature-hash arithmetic, randomized by
hypothesis (Spark parity of the same arithmetic is pinned by the unit
suites and DuckDB oracles; these pin the *invariants*)."""

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30),
    min_size=1,
    max_size=20,
)


def _tfidf(corpus):
    """Replica of tfidf_top_terms' scoring (smooth idf, round-6)."""
    docs = [c for c in corpus if c]
    n = len(docs)
    df = Counter()
    for d in docs:
        df.update(set(d))
    out = []
    for i, d in enumerate(docs):
        tf = Counter(d)
        for t, f in tf.items():
            out.append((i, t, round(f * (math.log((n + 1) / (df[t] + 1)) + 1), 6)))
    return out, n, df


@given(corpus_strategy)
@settings(max_examples=200, deadline=None)
def test_tfidf_invariants(corpus):
    docs = [c for c in corpus if c]
    scores, n, df = _tfidf(corpus)
    for _, _, s in scores:
        # smooth idf keeps every score strictly positive (even corpus-wide
        # terms score tf * (ln((n+1)/(n+1)) + 1) = tf)
        assert s > 0
    # a term present in every doc scores exactly its tf
    for i, t, s in scores:
        if df[t] == n:
            assert s == round(float(Counter(docs[i])[t]), 6)


@given(corpus_strategy)
@settings(max_examples=200, deadline=None)
def test_unigram_lm_bits_bounds(corpus):
    # per-doc bits/token lies in [min over its terms, max over its terms]
    # of -log2 p(w), and the token-weighted mean equals the corpus entropy
    docs = [c for c in corpus if c]
    if not docs:
        return
    lm = Counter(w for d in docs for w in d)
    T = sum(lm.values())
    bits = lambda w: math.log2(T) - math.log2(lm[w])
    weighted = 0.0
    for d in docs:
        b = sum(bits(w) for w in d) / len(d)
        assert min(bits(w) for w in d) - 1e-9 <= b <= max(bits(w) for w in d) + 1e-9
        weighted += sum(bits(w) for w in d)
    H = math.log2(T) - sum(c * math.log2(c) for c in lm.values()) / T
    assert abs(weighted / T - H) < 1e-9


@given(corpus_strategy, st.integers(2, 32))
@settings(max_examples=200, deadline=None)
def test_feature_hash_norm_and_scale_invariance(corpus, dims):
    import hashlib

    def embed(doc):
        buckets = Counter()
        for w in doc:
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % dims
            buckets[h] += 1
        nrm = math.sqrt(sum(v * v for v in buckets.values()))
        return {k: v / nrm for k, v in buckets.items()}

    for d in corpus:
        if not d:
            continue
        e = embed(d)
        assert abs(sum(v * v for v in e.values()) - 1.0) < 1e-9
        assert all(0 <= k < dims for k in e)
        # doubling the doc leaves the normalized embedding unchanged
        assert embed(d + d).keys() == e.keys()
        for k, v in embed(d + d).items():
            assert abs(v - e[k]) < 1e-9
