"""bench.py's stdout compaction: the driver keeps only the LAST ~2000
chars of stdout (round 4 lost the JSON head to exactly this), so the one
JSON line must always fit the tail window, stay parseable, and never carry
the per-rep arrays (those live in bench_last.json only)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import stdout_line


def _result(n_queries, name_len=24, val=1.234, reps=3):
    qs = {f"q{'x' * name_len}{i:03d}": val + i * 0.001 for i in range(n_queries)}
    return {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "reps": {k: [v, v + 0.5, v + 1.0] for k, v in qs.items()},
    }


def test_small_result_full_precision():
    r = _result(10)
    line = stdout_line(r)
    parsed = json.loads(line)
    assert parsed["queries"] == {k: round(v, 3) for k, v in r["queries"].items()}
    assert "reps" not in parsed
    assert "omitted" not in parsed


def test_always_fits_and_parses_across_registry_sizes():
    for n in (1, 40, 70, 150, 400, 1000):
        line = stdout_line(_result(n))
        assert len(line) <= 1995, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_queries_total_runtime"
        assert "reps" not in parsed
        # whenever queries were dropped, the omitted count accounts for them
        if "omitted" in parsed:
            assert parsed["omitted"] + len(parsed["queries"]) == n


def test_truncation_keeps_most_expensive():
    r = _result(400)
    r["queries"]["zz_hot_query"] = 99.9
    parsed = json.loads(stdout_line(r))
    assert parsed.get("omitted", 0) > 0
    assert "zz_hot_query" in parsed["queries"]
    assert max(parsed["queries"].values()) == 99.9


def test_no_dead_zone_between_decimals_and_fallback():
    """A line landing between the decimal-reduction break and the fallback
    threshold must still come back <= target — the r5 bench had a dead zone
    (1900 break vs 1990 fallback) where neither treatment applied."""
    for n in range(60, 90):
        line = stdout_line(_result(n))
        assert len(line) <= 1995, (n, len(line))
        json.loads(line)
