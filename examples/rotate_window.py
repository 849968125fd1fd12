"""Print next round's staleness-rotated driver window (the _PRIORITY list).

The rotation chore (tests/test_registry_window.py::test_window_prefers_
stalest): when a new CORRECTNESS_r{N}.json lands, bump
ROTATION_BASIS_ROUNDS in plans/__init__.py to N and replace _PRIORITY's
body with this script's output — the policy test then re-derives and
enforces the same set, so the window can never silently drift from the
freshness policy.

    python examples/rotate_window.py [basis_round]

basis_round defaults to the highest CORRECTNESS_r*.json present.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compute_window(basis: int):
    """(pinned, window, last-green map) under the staleness policy — the
    same derivation as tests/test_registry_window.py::
    expected_stalest_window, parameterized by basis round (a test pins the
    two in lockstep for the current basis)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import ORACLES
    from tests.test_registry_window import FLAGSHIPS, R13_PROMOTIONS, WINDOW

    files = sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    last = {}
    for f in files:
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        if rnd > basis:
            continue
        with open(f) as fh:
            for name, row in json.load(fh).items():
                if row.get("err") is None and row.get("hash_match"):
                    last[name] = max(rnd, last.get(name, 0))

    pinned = list(FLAGSHIPS) + [n for n in R13_PROMOTIONS if n not in FLAGSHIPS]
    pool = sorted(
        (n for n in ORACLES if n not in pinned),
        key=lambda n: (last.get(n, 0), n),
    )
    return pinned, pinned + pool[: WINDOW - len(pinned)], last, pool[WINDOW - len(pinned):]


def main() -> None:
    from tests.test_registry_window import FLAGSHIPS, R13_PROMOTIONS

    files = sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    rounds = [int(re.search(r"_r(\d+)\.json$", f).group(1)) for f in files]
    basis = int(sys.argv[1]) if len(sys.argv) > 1 else max(rounds)
    pinned, window, last, overflow = compute_window(basis)

    print(f"# ROTATION_BASIS_ROUNDS = {basis}")
    print("_PRIORITY = [")
    print("    # flagships (always in)")
    for n in FLAGSHIPS:
        print(f'    "{n}",')
    if R13_PROMOTIONS:
        print("    # promotions (first driver row pending)")
        for n in R13_PROMOTIONS:
            if n not in FLAGSHIPS:
                print(f'    "{n}",')
    cur = None
    for n in window[len(pinned):]:
        if last.get(n, 0) != cur:
            cur = last.get(n, 0)
            print(f"    # -- last green r{cur} --")
        print(f'    "{n}",')
    print("]")
    nxt = overflow[:10]
    print(f"# next-stalest queue after this window: {nxt}")


if __name__ == "__main__":
    main()
