"""Guards on probe_interleaved --accept (ADVICE r8): an adjudication entry
is SCALE.md evidence, so the recorder must refuse to write one without the
full ritual — a control query probed in the same interleave with a known
best (--ref), a real round tag, and explicit --force before replacing an
existing entry (whose prior content survives under 'history').

All guards fire during argument validation, BEFORE Spark starts, so these
tests drive main() with fake argv and expect argparse's SystemExit(2).
"""

import importlib.util
import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "probe_interleaved", os.path.join(_REPO, "examples", "probe_interleaved.py")
)
pi = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pi)


def _run(monkeypatch, argv):
    monkeypatch.setattr(pi.sys, "argv", ["probe_interleaved.py"] + argv)
    with pytest.raises(SystemExit) as e:
        pi.main()
    return e.value.code


def test_accept_requires_probed_name(monkeypatch):
    assert _run(monkeypatch, ["qa", "--accept", "qb", "--round-tag", "9"]) == 2


def test_accept_requires_round_tag(monkeypatch):
    # default round-tag 0 must be rejected: a round-0 entry is
    # indistinguishable from a careless re-run in the audit trail
    assert _run(
        monkeypatch,
        ["qa", "ctrl", "--accept", "qa", "--ref", "ctrl=1.0"],
    ) == 2


def test_accept_requires_control_with_ref(monkeypatch):
    # no --ref at all: no control evidence
    assert _run(
        monkeypatch, ["qa", "ctrl", "--accept", "qa", "--round-tag", "9"]
    ) == 2
    # --ref only for the accepted query itself: still no control
    assert _run(
        monkeypatch,
        ["qa", "--accept", "qa", "--round-tag", "9", "--ref", "qa=1.0"],
    ) == 2
    # --ref for a query not probed in this interleave: not a control either
    assert _run(
        monkeypatch,
        ["qa", "--accept", "qa", "--round-tag", "9", "--ref", "other=1.0"],
    ) == 2


def test_accept_refuses_overwrite_without_force(monkeypatch, tmp_path):
    book = tmp_path / "BENCH_ADJUDICATIONS.json"
    book.write_text(json.dumps({"qa": {"round": 8, "verdict": "accepted"}}))
    real_exists, real_open = os.path.exists, open

    # point the module's adjudications path at the tmp book
    monkeypatch.setattr(
        pi.os.path, "exists",
        lambda p: real_exists(str(book)) if p.endswith(
            "BENCH_ADJUDICATIONS.json") else real_exists(p),
    )
    import builtins

    monkeypatch.setattr(
        builtins, "open",
        lambda p, *a, **k: real_open(
            str(book) if str(p).endswith("BENCH_ADJUDICATIONS.json") else p,
            *a, **k),
    )
    assert _run(
        monkeypatch,
        ["qa", "ctrl", "--accept", "qa", "--round-tag", "9",
         "--ref", "ctrl=1.0"],
    ) == 2


def test_accept_rejects_nonpositive_ref_best(monkeypatch):
    # a zero/negative --ref best would crash (or poison) the control ratio
    # AFTER the multi-minute probe; reject it during argument validation
    assert _run(
        monkeypatch,
        ["qa", "ctrl", "--accept", "qa", "--round-tag", "9",
         "--ref", "ctrl=0"],
    ) == 2
    assert _run(
        monkeypatch,
        ["qa", "ctrl", "--accept", "qa", "--round-tag", "9",
         "--ref", "ctrl=-1.5"],
    ) == 2
