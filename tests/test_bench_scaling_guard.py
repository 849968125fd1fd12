"""The superlinearity guard's flag rule (examples/bench_scaling.py): the
tripwire must catch a quadratic plan at a 10x data ratio while staying
quiet on fixed-overhead-dominated queries — the failure mode it exists for
is an accidentally O(n^2) composition that a plan audit missed."""

import importlib.util
import os


def _mod():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "bench_scaling.py")
    spec = importlib.util.spec_from_file_location("bench_scaling", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_exponents():
    m = _mod()
    # perfectly linear: 10x data -> 10x time
    assert abs(m.effective_exponent(1.0, 10.0, 10.0) - 1.0) < 1e-9
    # quadratic: 10x data -> 100x time
    assert abs(m.effective_exponent(0.5, 50.0, 10.0) - 2.0) < 1e-9
    # sublinear / overhead-dominated
    assert m.effective_exponent(0.4, 0.5, 10.0) < 0.2
    # zero timings can't produce inf
    assert m.effective_exponent(0.0, 1.0, 10.0) < 4


def test_flag_rule():
    m = _mod()
    # quadratic AND slow at big sf -> flagged
    assert m.is_superlinear(0.5, 50.0, 10.0)
    # superlinear ratio but both sub-second: overhead noise, not evidence
    assert not m.is_superlinear(0.02, 1.5, 10.0)
    # slow but linear -> fine
    assert not m.is_superlinear(1.0, 9.0, 10.0)
    # the md5-twin shape: constant-dominated, ratio ~1 -> fine
    assert not m.is_superlinear(4.8, 5.3, 10.0)
