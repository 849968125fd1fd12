"""The driver's correctness gate checks the FIRST 50 registered queries
(round-1 lesson: everything after index 49 got no driver row; the r02
CORRECTNESS file confirms the cap is exactly 50). Pin the window's
composition so future registrations can't silently evict the flagship
operators, dilute oracle coverage, or land an oracled query outside every
round's window.

ROUND-6 POLICY (VERDICT r5 item 1): with all 141 oracles driver-green as
of CORRECTNESS_r05, the window's job is FRESHNESS, not coverage — each
rotation takes the 5 pipeline flagships plus the (50 - 5 - promotions)
oracled queries whose most recent green driver row is OLDEST (ties broken
by name). test_window_prefers_stalest re-derives that set from the
CORRECTNESS_r01..r{ROTATION_BASIS_ROUNDS} artifacts, so staleness
rotation is a standing, machine-checked chore rather than a judgment
call.
"""

import json
import os

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
    ORACLES,
    QUERIES,
    ROTATION_BASIS_ROUNDS,
)

WINDOW = 50  # the driver checks exactly this many entries (CORRECTNESS_r02)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Always inside the window: the five end-to-end summarization pipelines are
# the engine's headline deliverable and re-verify the whole operator stack
# (chunk -> map -> collapse/critique/refine/tree -> reduce) every round.
FLAGSHIPS = [
    "pipeline_mapreduce_mock",
    "pipeline_iterative_mock",
    "pipeline_critique_mock",
    "pipeline_hierarchical_mock",
    "pipeline_truncated_mock",
]


# Oracled queries added MID-round (after the current window froze) that must
# be rotated into the NEXT window for their first driver row. Kept empty
# unless a genuinely new oracled query lands (VERDICT r5 item 6: freshness
# beats growth). The orphan test exempts exactly this list.
R13_PROMOTIONS: list = []


def _green_rows_by_round(max_round):
    """name -> most recent round (1..max_round) with a GREEN driver row.
    err rows and mismatching rows don't count — a query that only ever
    crashed the driver must stay in (or return to) the window until it
    goes green."""
    last = {}
    for rnd in range(1, max_round + 1):
        path = os.path.join(_REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("err") is None and row.get("hash_match"):
                    last[name] = rnd
    return last


def _driver_checked_names():
    """Names with a GREEN driver row in any prior round's CORRECTNESS file."""
    seen = set()
    for fn in sorted(os.listdir(_REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(_REPO, fn)) as f:
                for name, row in json.load(f).items():
                    if row.get("err") is None and row.get("hash_match"):
                        seen.add(name)
    return seen


def expected_stalest_window():
    """The window the staleness policy prescribes: flagships + promotions +
    the stalest oracled queries, ranked by (last-green round, name). A
    query with NO green row ever ranks first (round 0) — never-verified
    beats stale."""
    last = _green_rows_by_round(ROTATION_BASIS_ROUNDS)
    pinned = list(FLAGSHIPS) + [n for n in R13_PROMOTIONS if n not in FLAGSHIPS]
    pool = sorted(
        (n for n in ORACLES if n not in pinned),
        key=lambda n: (last.get(n, 0), n),
    )
    return pinned + pool[: WINDOW - len(pinned)]


def test_flagships_inside_driver_window():
    window = list(QUERIES)[:WINDOW]
    missing = [n for n in FLAGSHIPS if n not in window]
    assert not missing, f"flagships outside the driver window: {missing}"


def test_window_prefers_stalest():
    """The registered window must equal the staleness-policy window derived
    from the CORRECTNESS artifacts. When a new round's CORRECTNESS file
    lands, bump ROTATION_BASIS_ROUNDS in plans/__init__.py and regenerate
    _PRIORITY from this function's output — that IS the rotation chore."""
    window = set(list(QUERIES)[:WINDOW])
    expected = set(expected_stalest_window())
    assert window == expected, (
        f"window deviates from staleness policy — "
        f"unexpected: {sorted(window - expected)}; "
        f"missing: {sorted(expected - window)}"
    )


def test_window_is_exactly_full():
    """An underfull window wastes driver checks; an overfull one silently
    evicts the back of the list."""
    window = list(QUERIES)[:WINDOW]
    assert len(window) == WINDOW
    assert len(set(window)) == WINDOW


def test_every_oracled_query_has_a_driver_row_somewhere():
    """Window-capacity hygiene: no oracled query may sit outside EVERY
    window — it must have a green row in a past round's CORRECTNESS file,
    be inside the current first-50 (so the coming round checks it), or be
    explicitly queued in R13_PROMOTIONS for the next rotation. A new
    oracled query registered anywhere else fails here immediately, so the
    rotation chore can never silently backlog."""
    window = set(list(QUERIES)[:WINDOW])
    covered = _driver_checked_names() | window | set(R13_PROMOTIONS)
    orphans = sorted(set(ORACLES) - covered)
    assert not orphans, f"oracled queries never driver-checked: {orphans}"


def test_promotion_candidates_are_oracled():
    """Every promotion candidate must exist and carry an oracle — and once
    one gains a green driver row, the next rotation drops it from the
    promotions list so the orphan exemption doesn't outlive its purpose."""
    for n in R13_PROMOTIONS:
        assert n in QUERIES, f"promotion candidate {n} not registered"
        assert n in ORACLES, f"promotion candidate {n} has no oracle"


def test_window_oracle_density():
    window = list(QUERIES)[:WINDOW]
    oracled = [n for n in window if n in ORACLES]
    # round 3: every window entry carries an oracle (the rows-only
    # showcases — embedding_ivf_top3, bpe_token_counts, minhash/simhash raw
    # twins, doc_winnow_fast — ride the tail; their oracled twins are green)
    assert len(oracled) == len(window), (
        f"rows-only entries in window: {sorted(set(window) - set(oracled))}"
    )


def test_every_oracled_name_is_registered():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 25


def test_rotation_helper_matches_policy():
    """examples/rotate_window.py is the chore tool that generates the next
    _PRIORITY block; its derivation must stay in lockstep with this test's
    policy or a rotation could silently drift."""
    import importlib.util

    path = os.path.join(_REPO, "examples", "rotate_window.py")
    spec = importlib.util.spec_from_file_location("rotate_window", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _, window, _, _ = mod.compute_window(ROTATION_BASIS_ROUNDS)
    assert window == expected_stalest_window()
