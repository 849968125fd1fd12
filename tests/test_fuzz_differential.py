"""The differential fuzzer (examples/fuzz_differential.py) is round 9's
standing adversarial check over operator compositions the frozen registry
never exercises. Keep it exercised: generator determinism, the comparison
normalization, and a small live Spark-vs-DuckDB batch every session. The
nightly-size run (200 shapes, sf0.01) is recorded in fuzz_last.json."""

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "fuzz_differential", os.path.join(_REPO, "examples", "fuzz_differential.py")
)
fz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fz)


def test_generator_is_seed_deterministic(sf_dir):
    prof = fz.profile_tables(sf_dir)
    for seed in (1, 7, 900100035):
        a = fz.ShapeGen(seed, prof).gen()
        b = fz.ShapeGen(seed, prof).gen()
        assert a == b, f"seed {seed} not replayable"


def test_norm_cell_and_tolerant_equal():
    import datetime

    import pandas as pd

    assert fz._norm_cell(None) == "<null>"
    assert fz._norm_cell(float("nan")) == "<null>"
    assert fz._norm_cell(48.0) == "48"
    assert fz._norm_cell(True) == "True"
    # date folds onto the timestamp rendering (Spark DATE vs DuckDB
    # datetime64 for the same column)
    assert fz._norm_cell(datetime.date(2020, 1, 2)) == "2020-01-02 00:00:00"
    assert fz._norm_cell(pd.Timestamp("2020-01-02")) == "2020-01-02 00:00:00"
    # float jitter inside 1e-6 rel passes the tolerant pass, not strict
    a = [("1.0000001", "x")]
    b = [("1.0000002", "x")]
    assert a != b and fz._tolerant_equal(a, b)
    assert not fz._tolerant_equal([("1.0", "x")], [("1.1", "x")])
    assert not fz._tolerant_equal([("1.0",)], [("1.0",), ("1.0",)])


def test_known_divergence_detector_is_narrow():
    roll = "SELECT s, count(*) FROM t GROUP BY ROLLUP (s)"
    # spark empty + duck grand-total-only -> classified
    assert fz._is_rollup_empty_input(roll, [], [("<null>", "0")])
    # any real DuckDB data row -> NOT classified (stays a loud diff)
    assert not fz._is_rollup_empty_input(roll, [], [("a", "3")])
    # spark non-empty -> NOT classified
    assert not fz._is_rollup_empty_input(roll, [("<null>", "0")], [("<null>", "0")])
    # non-grouping-set SQL -> NOT classified
    assert not fz._is_rollup_empty_input(
        "SELECT count(*) FROM t", [], [("<null>", "0")]
    )


def test_small_live_batch(spark, sf_dir):
    """A fresh 10-shape batch through both engines — the standing smoke
    that the grammar stays inside the shared dialect subset. Distinct seed
    family from the nightly run so sessions keep widening coverage."""
    seeds = [7_700_000 + i for i in range(10)]
    results = fz.run_shapes(spark, sf_dir, seeds, log=lambda m: None)
    bad = [r for r in results
           if r["status"] not in ("ok", "float_jitter", "known_divergence")]
    assert not bad, f"differential failures: {bad}"


def test_nightly_artifact_is_clean():
    """The committed fuzz_last.json must record a clean nightly-size run:
    >=200 shapes, zero unclassified failures, seeds present for replay."""
    import json

    with open(os.path.join(_REPO, "fuzz_last.json")) as f:
        d = json.load(f)
    assert d["summary"]["n"] >= 200
    assert d["summary"]["failures"] == []
    assert all("seed" in s for s in d["shapes"])


def test_empty_sweep_artifact_is_clean():
    """The committed empty_sweep_last.json must record full-registry
    empty-input agreement: every oracled query matches DuckDB over
    zero-row tables except exactly the three triaged grouping-set queries
    (the rollup_empty_input class, operators/rollup.py)."""
    import json

    with open(os.path.join(_REPO, "empty_sweep_last.json")) as f:
        d = json.load(f)
    assert d["total"] >= 141
    assert d["new_diffs"] == [] and d["errors"] == []
    assert d["known_divergent"] == [
        "lineitem_grouping_sets", "region_nation_rollup", "returnflag_cube",
    ]
    assert d["ok"] == d["total"] - 3


def test_sf01_parity_artifact_is_clean():
    """parity_sf01_r10.json records the bounded full-registry parity sweep
    at sf0.1 (10x the driver's gate): zero mismatches/errors, with only
    the components family skipped on the 75s DuckDB oracle budget. Those
    three are covered bit-for-bit by components_sf01_last.json (the
    iterative-closure harness, asserted in test_round10_fixes), so the
    two artifacts together say 141/141 at sf0.1."""
    import json

    with open(os.path.join(_REPO, "parity_sf01_r10.json")) as f:
        d = json.load(f)
    assert d["total"] >= 141
    assert d["mismatch"] == [] and d["errors"] == []
    assert d["skipped_oracle_budget"] == [
        "doc_dedup_keep_best", "doc_dedup_survivors", "doc_dup_clusters",
    ]
    assert d["ok"] == d["total"] - 3


def test_tolerant_equal_round_boundary_class():
    """Round-boundary flips (an in-SQL round amplifying sub-ulp
    accumulation noise to one unit in the last place) classify as jitter
    ONLY for >=3-decimal values and only within 1.5 units — coarse diffs
    stay loud."""
    ok = fz._tolerant_equal
    assert ok([("516.449", "a")], [("516.448", "a")])      # seed 11111100041
    assert not ok([("516.449", "a")], [("516.446", "a")])  # 3 units: real
    assert not ok([("1.0", "a")], [("1.1", "a")])          # 1dp: excluded
    assert not ok([("51.64", "a")], [("51.65", "a")])      # 2dp: excluded
