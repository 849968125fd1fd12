"""Property tests for the round-4 curation operators — pure-Python replicas
of the line-dedup, aHash, RRF, mixture-rate, and bloom arithmetic,
randomized by hypothesis (Spark parity of the same arithmetic is pinned by
the unit suites and DuckDB oracles; these pin the *invariants*)."""

from hypothesis import given, settings
from hypothesis import strategies as st

_LINES = ["aa", "bb", "cc", "dd", "", "  ", "ee ff"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_LINES), min_size=0, max_size=8),
    min_size=1,
    max_size=10,
)


def _line_dedup(docs):
    """Replica of line_dedup's keep-first rule: non-blank lines keep the
    globally first (doc_idx, line_idx) occurrence; blanks always survive."""
    seen = set()
    out = []
    for di, lines in enumerate(docs):
        kept = []
        removed = 0
        for line in lines:
            if line.strip() == "":
                kept.append(line)
            elif line in seen:
                removed += 1
            else:
                seen.add(line)
                kept.append(line)
        out.append((kept, len(lines), removed))
    return out


@given(docs_strategy)
@settings(max_examples=200, deadline=None)
def test_line_dedup_invariants(docs):
    out = _line_dedup(docs)
    all_content = [l for kept, _, _ in out for l in kept if l.strip() != ""]
    # every surviving content line is globally unique
    assert len(all_content) == len(set(all_content))
    # blank lines are never dropped; counts reconcile
    for (kept, n_lines, removed), orig in zip(out, docs):
        assert n_lines == len(orig)
        assert len(kept) + removed == n_lines
        assert sum(1 for l in kept if l.strip() == "") == sum(
            1 for l in orig if l.strip() == ""
        )
    # union of surviving content == union of input content (first copy kept)
    assert set(all_content) == {
        l for d in docs for l in d if l.strip() != ""
    }


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_ahash_invariants(data):
    """Drives the LIBRARY aHash core (the exact function the UDF calls),
    not a replica."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.multimodal import (
        ahash_from_pixels,
    )

    h = ahash_from_pixels(list(data))
    if len(data) < 64:
        assert h is None
        return
    assert -(1 << 63) <= h < 1 << 63  # signed 64-bit column domain
    assert ahash_from_pixels(list(data)) == h  # deterministic
    u = h + (1 << 64) if h < 0 else h
    # at least one cell sits at-or-above the global mean, so the hash is
    # never all-zeros; constant streams saturate to all-ones
    assert u != 0
    if len(set(data)) == 1:
        assert u == (1 << 64) - 1
    # translation invariance: aHash thresholds against the stream's own
    # mean, so a constant brightness shift never changes the hash
    shifted = [min(255, p + 1) for p in data]
    if max(data) < 255:
        assert ahash_from_pixels(shifted) == h


@given(
    st.lists(
        st.lists(st.integers(0, 30), min_size=1, max_size=10, unique=True),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=200, deadline=None)
def test_rrf_invariants(rankings):
    """RRF replica: fused order respects domination — a doc ranked at least
    as well as another in EVERY list (and present in at least as many)
    never scores lower."""
    k0 = 60
    scores = {}
    for ranking in rankings:
        for rank0, doc in enumerate(ranking):
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (k0 + rank0 + 1)
    for a in scores:
        for b in scores:
            better_everywhere = all(
                (a in r and (b not in r or r.index(a) <= r.index(b)))
                or (a in r and b not in r)
                for r in rankings
                if a in r or b in r
            )
            appears = sum(a in r for r in rankings) >= sum(b in r for r in rankings)
            if better_everywhere and appears:
                assert scores[a] >= scores[b] - 1e-12


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(1, 10_000),
        min_size=1,
        max_size=4,
    ),
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(0.05, 1.0),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=200, deadline=None)
def test_mixture_rates_invariants(masses, shares):
    """Replica of mixture_rates' closed form: rates stay in [0,1], the
    binding source saturates, and kept masses hit the normalized target
    shares exactly (when every target source exists)."""
    total = sum(shares.values())
    norm = {k: v / total for k, v in shares.items()}
    present = {k: masses.get(k, 0) for k in norm}
    if any(m == 0 for m in present.values()):
        t = 0.0
    else:
        t = min(present[k] / norm[k] for k in norm)
    kept = {k: norm[k] * t for k in norm}
    for k in norm:
        rate = 0.0 if present[k] == 0 else min(1.0, norm[k] * t / present[k])
        assert 0.0 <= rate <= 1.0
        if t > 0:
            assert kept[k] <= present[k] + 1e-9  # never upsample
    if t > 0:
        total_kept = sum(kept.values())
        for k in norm:
            assert abs(kept[k] / total_kept - norm[k]) < 1e-9
        assert any(abs(kept[k] - present[k]) < 1e-6 for k in norm)  # binding saturates
