"""The streaming parameter fuzzer (examples/fuzz_streaming_params.py):
windowed stateful aggregation is a parameter family, and the streaming
execution path (stateful agg operators, session merging) is physically
different from the batch hash aggregate — the fixed-spec parity tests in
test_streaming.py can't see a spec-dependent divergence. Keep the
generator deterministic and a small live batch running per session."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "fuzz_streaming_params",
    os.path.join(_REPO, "examples", "fuzz_streaming_params.py"))
fzs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fzs)


def test_config_generator_is_seed_deterministic_and_constrained():
    for seed in (1, 42001, 700700023):
        a, b = fzs.gen_config(seed), fzs.gen_config(seed)
        assert a == b
    # session windows must always carry a grouping key: streaming Spark
    # rejects global session aggregation (found by the first smoke batch)
    for seed in range(300):
        cfg = fzs.gen_config(seed)
        if cfg["op"] == "session":
            assert cfg["key"] is not None
        if cfg["op"] == "sliding":
            w = int(cfg["window"].split()[0])
            s = int(cfg["slide"].split()[0])
            assert 1 <= s <= w
        if cfg["op"] == "interval":
            assert cfg["point_type"] != cfg["interval_type"]
            assert cfg["bucket_sec"] > 0 and cfg["len_min"] > 0
        if cfg["op"] == "disorder":
            assert 1 <= cfg["max_shift"] <= 2
            assert cfg["n_batches"] >= 3
            if cfg["slide"]:
                assert (int(cfg["slide"].split()[0])
                        <= int(cfg["window"].split()[0]))
        if cfg["op"] == "disorder_session":
            # streaming sessions require a grouping key, and the schedule
            # stays bounded like the windowed disorder family
            assert cfg["key"] is not None
            assert 1 <= cfg["max_shift"] <= 2 and cfg["n_batches"] >= 3
        if cfg["op"] == "disorder_interval":
            assert cfg["point_type"] != cfg["interval_type"]
            # bounded bucket replication: the multi-batch state store pays
            # the explode factor per batch
            assert cfg["len_min"] * 60 / cfg["bucket_sec"] <= 12
            assert 1 <= cfg["max_shift"] <= 2 and cfg["n_batches"] >= 3


def test_small_live_batch(spark, sf_dir):
    """Four fresh configs through stream AND batch per session — a
    distinct seed family from the committed nightly record."""
    seeds = [9_910_000 + i for i in range(4)]
    results = fzs.run_configs(spark, sf_dir, seeds, log=lambda m: None)
    bad = [r for r in results if r["status"] != "ok"]
    assert not bad, f"stream/batch divergence: {bad}"


def test_disorder_config_live(spark, sf_dir):
    """One out-of-order arrival config per session: chunked file stream
    with shifted rows, append-mode windowed agg vs the pure-Python
    watermark replay — and the schedule must actually drop something,
    or the invariant is vacuously true."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
        load_table,
    )

    # shift=1 can NEVER drop (the late-data filter lags the eviction
    # watermark by one batch — simulate_disorder's pinned semantics), so a
    # dropping schedule needs max_shift=2 with a high late fraction
    for seed in range(9_920_000, 9_920_200):
        cfg = fzs.gen_config(seed)
        if cfg["op"] == "disorder" and cfg["p_late"] == 0.2 \
                and cfg["max_shift"] == 2 and cfg["n_batches"] >= 5 \
                and cfg["watermark"] != "60 minutes":
            break
    else:
        raise AssertionError("no dropping disorder seed in range")
    phase_box = {"phase": "stream"}
    got, want, extra = fzs._run_disorder(
        spark, cfg, load_table(spark, sf_dir, "events"), "fzdis_live",
        phase_box)
    spark.catalog.dropTempView("fzdis_live")
    normalize = fzs._normalize_fn()
    gc, gr = normalize(got)
    wc, wr = normalize(want)
    assert gc == wc and gr == wr, (
        f"disorder divergence (cfg {cfg}): {len(gr)} vs {len(wr)} rows")
    assert extra["n_dropped"] > 0, f"vacuous schedule: {extra}"


def test_disorder_session_live(spark, sf_dir):
    """One out-of-order session-window config per session vs the exact
    eviction-tracking replay (simulate_session_disorder) — with a schedule
    that actually drops rows, so the late-filter leg isn't vacuous."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
        load_table,
    )

    for seed in range(9_930_000, 9_930_400):
        cfg = fzs.gen_config(seed)
        if cfg["op"] == "disorder_session" and cfg["p_late"] == 0.2 \
                and cfg["max_shift"] == 2 and cfg["n_batches"] >= 5 \
                and cfg["watermark"] == "5 minutes":
            break
    else:
        raise AssertionError("no dropping disorder_session seed in range")
    phase_box = {"phase": "stream"}
    got, want, extra = fzs._run_disorder_session(
        spark, cfg, load_table(spark, sf_dir, "events"), "fzdissess_live",
        phase_box)
    spark.catalog.dropTempView("fzdissess_live")
    normalize = fzs._normalize_fn()
    gc, gr = normalize(got)
    wc, wr = normalize(want)
    assert gc == wc and gr == wr, (
        f"session disorder divergence (cfg {cfg}): {len(gr)} vs {len(wr)} rows")
    assert extra["n_dropped"] > 0, f"vacuous schedule: {extra}"


def test_disorder_interval_live(spark, sf_dir):
    """One out-of-order interval-join config per session: the sandwich
    (sure pairs all emitted, nothing fabricated) must hold AND bind — a
    non-empty sure set, or the guarantee leg proved nothing."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
        load_table,
    )

    # sparse sf0.001 events can make a short interval's pair set empty, so
    # walk candidate configs (widest interval first) until the sure set
    # binds — every candidate tried must still satisfy the sandwich
    cands = [fzs.gen_config(s) for s in range(9_940_000, 9_941_000)]
    cands = [c for c in cands
             if c["op"] == "disorder_interval" and c["len_min"] == 60]
    assert cands, "no disorder_interval seed in range"
    events = load_table(spark, sf_dir, "events")
    tried = []
    for cfg in cands[:5]:
        phase_box = {"phase": "stream"}
        ok, detail, extra = fzs._run_disorder_interval(
            spark, cfg, events, "fzdisiv_live", phase_box)
        spark.catalog.dropTempView("fzdisiv_live")
        assert ok, f"interval disorder sandwich violated (cfg {cfg}): {detail}"
        tried.append(extra)
        if extra["n_sure_pairs"] > 0:
            break
    else:
        raise AssertionError(f"sure set vacuous in all candidates: {tried}")


def test_disorder_sweep_artifact_covers_session_and_interval():
    """The committed r12 disorder sweep (--ops disorder_session
    disorder_interval) must be clean and non-vacuous on both legs."""
    with open(os.path.join(_REPO, "fuzz_streaming_disorder_r12.json")) as f:
        d = json.load(f)
    assert d["summary"]["failures"] == []
    ops = [r["op"] for r in d["configs"]]
    assert ops.count("disorder_session") >= 5
    assert ops.count("disorder_interval") >= 5
    assert d["summary"]["watermark_dropped_rows"] > 0
    assert d["summary"]["interval_unsafe_rows"] > 0
    assert sum(r.get("n_sure_pairs", 0) for r in d["configs"]) > 0


def test_streaming_fuzz_artifact_is_clean():
    with open(os.path.join(_REPO, "fuzz_streaming_last.json")) as f:
        d = json.load(f)
    assert d["summary"]["n"] >= 24
    assert d["summary"]["failures"] == []
    ops = {r["op"] for r in d["configs"]}
    assert ops >= {"tumbling", "sliding", "session", "interval"}
    if "disorder" in ops:  # r11+ sweeps: the drop set must be non-vacuous
        assert d["summary"].get("watermark_dropped_rows", 0) > 0
