"""Round-7 property suite: hypothesis pins for invariants whose violations
this round's review pass fixed — the chunk-budget contract (overlap shed)
and the streaming idle-deadline monotonicity. Pure-Python properties (no
Spark session per example), so hundreds of cases run in seconds.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.chunking import (
    recursive_split_text,
    ws_len,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming.events import (
    _monotone_deadline,
)

# words + separator-bearing punctuation + whitespace variety, so the
# separator hierarchy (paragraph/newline/sentence/word) all get exercised
_texts = st.lists(
    st.sampled_from(
        ["alpha", "beta", "gamma", "x", "!", ".", "?", ";", "\n", "\n\n", " ", "  "]
    ),
    min_size=0,
    max_size=200,
).map(lambda parts: " ".join(parts))


@settings(max_examples=300, deadline=None)
@given(
    text=_texts,
    chunk_size=st.integers(min_value=1, max_value=40),
    chunk_overlap=st.integers(min_value=0, max_value=60),
)
def test_split_chunks_never_exceed_budget(text, chunk_size, chunk_overlap):
    """EVERY chunk respects chunk_size, for any overlap — including overlap
    larger than the budget itself. Pieces bottom out at single tokens
    (ws_len 1 <= any chunk_size >= 1), so the merge + shed loop fully owns
    the budget; before the shed fix, retained overlap + the incoming piece
    could exceed chunk_size by up to chunk_overlap tokens."""
    chunks = recursive_split_text(text, chunk_size, chunk_overlap)
    assert all(ws_len(c) <= chunk_size for c in chunks), [
        (ws_len(c), c) for c in chunks if ws_len(c) > chunk_size
    ]
    # no empty chunks, ever
    assert all(c.strip() for c in chunks)


@settings(max_examples=300, deadline=None)
@given(
    text=_texts,
    chunk_size=st.integers(min_value=1, max_value=40),
)
def test_split_without_overlap_preserves_all_tokens_in_order(text, chunk_size):
    """overlap=0 is a partition of the token stream: concatenating the
    chunks reproduces the document's tokens exactly, in order."""
    chunks = recursive_split_text(text, chunk_size, 0)
    joined = " ".join(chunks).split()
    assert joined == text.split()


@settings(max_examples=300, deadline=None)
@given(
    events_ms=st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50
    ),
    idle_ms=st.integers(min_value=1, max_value=10**9),
    wm_steps=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50
    ),
)
def test_idle_deadline_is_monotone_and_contractual(events_ms, idle_ms, wm_steps):
    """Folding batches in ANY arrival order: the deadline never moves
    backward, always covers newest-ever + idle, and respects the watermark
    clamp — the invariant whose violation evicted docs early under
    out-of-order on-time events."""
    newest = -1
    deadline = -1
    wm = 0
    seen_max = -1
    for ev, step in zip(events_ms, wm_steps * (len(events_ms) // len(wm_steps) + 1)):
        prev_deadline = deadline
        newest, deadline = _monotone_deadline(newest, ev, idle_ms, wm)
        seen_max = max(seen_max, ev)
        assert newest == seen_max  # newest-ever, not newest-this-batch
        assert deadline >= prev_deadline  # monotone
        assert deadline >= seen_max + idle_ms  # contractual window
        assert deadline > wm  # legal for setTimeoutTimestamp
        wm += step  # watermark only advances
