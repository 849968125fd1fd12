"""Round-5 additions: xxhash64 production twins of the md5 star/incremental
oracle twins (rows-only registry entries, bench-visible), plus the
reserved-column guards added per round-4 ADVICE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.aggregate import (
    iqr_outliers,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    minhash_dedup_pairs,
    minhash_incremental_pairs,
    minhash_signatures,
    unpersist_inputs,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.pairing import (
    skip_existing_bloom,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_star_fast_pairs_subset_of_clique(spark, sf_dir):
    """Star edges are a subset of the clique pair set (same xxhash64
    signatures, same buckets — star just emits (bucket-min, member) spokes),
    and every clique pair's endpoints stay connected through some star rep."""
    docs = _docs(spark, sf_dir)
    star = minhash_dedup_pairs(docs, threshold=0.0, star=True)
    clique = minhash_dedup_pairs(docs, threshold=0.0, star=False)
    star_pairs = {(r.id1, r.id2) for r in star.collect()}
    clique_pairs = {(r.id1, r.id2) for r in clique.collect()}
    unpersist_inputs(star)
    unpersist_inputs(clique)
    assert star_pairs <= clique_pairs
    # connectivity equivalence: union-find over each edge set gives the
    # same partition of the touched ids (the star-contraction guarantee)
    def components(pairs):
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        groups: dict = {}
        for x in list(parent):
            groups.setdefault(find(x), set()).add(x)
        return {frozenset(g) for g in groups.values()}

    assert components(star_pairs) == components(clique_pairs)


def test_incremental_fast_matches_full_restricted(spark, sf_dir):
    """The incremental xxhash64 pair set == the full-corpus pair set
    restricted to pairs touching a 'new' id — the minhash_incremental_pairs
    contract, verified here on the production hash family (the md5 twin
    carries the SQL oracle)."""
    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=64).persist()
    new = sigs.filter(F.col("doc_id") >= 400)
    corpus = sigs.filter(F.col("doc_id") < 400)
    inc = minhash_incremental_pairs(new, corpus, n_hashes=64, n_bands=16, threshold=0.5)
    inc_pairs = {(r.id1, r.id2) for r in inc.collect()}
    full = minhash_dedup_pairs(docs, threshold=0.5, star=False)
    full_pairs = {
        (r.id1, r.id2) for r in full.collect() if r.id1 >= 400 or r.id2 >= 400
    }
    unpersist_inputs(full)
    sigs.unpersist()
    assert inc_pairs == full_pairs


def test_twin_registry_entries_run(spark, sf_dir):
    for name in ("minhash_star_fast", "minhash_incremental_fast"):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns == ["id1", "id2", "est_jaccard"]
        assert df.count() >= 0
        unpersist_inputs(df)


def test_bloom_reserved_column_guard(spark):
    docs = spark.createDataFrame([(1, True)], "doc_id long, _maybe boolean")
    existing = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="_maybe"):
        skip_existing_bloom(docs, existing, expected_items=10)


def test_iqr_reserved_column_guard(spark):
    df = spark.createDataFrame([(1, 2.0, 0.0)], "id long, v double, q1 double")
    with pytest.raises(ValueError, match="q1"):
        iqr_outliers(df, "v")


def test_learned_gate_generalizes_heuristic_labels(spark, sf_dir):
    """The train->score seam on REAL corpus data (not the separable
    synthetic set): fit on a deterministic 30% sample labeled by the
    heuristic composite (quality + entropy/8 - dup_token_ratio >= median),
    then on HELD-OUT docs the learned probability must (a) rank-correlate
    with the continuous heuristic and (b) separate the label classes.
    Everything is deterministic (seeded LR, hash sample), so the bounds
    carry slack only for library-version drift — measured rho is ~0.59 at
    sf0.001 and ~0.67 at sf0.01."""
    import importlib.util
    import os

    from pyspark.sql import Window

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "prepare_training_data.py"
    )
    spec = importlib.util.spec_from_file_location("prepare_training_data", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    docs = _docs(spark, sf_dir)
    scored, labeled_all, sample = mod.learned_quality_gate(docs)
    held = scored.join(labeled_all, "doc_id").join(sample, "doc_id", "left_anti")
    ranked = held.withColumn(
        "ra", F.row_number().over(Window.orderBy("quality_prob", "doc_id"))
    ).withColumn("rb", F.row_number().over(Window.orderBy("heur", "doc_id")))
    rho = ranked.agg(F.corr("ra", "rb")).first()[0]
    assert rho >= 0.4, rho
    means = {
        r["label"]: r["p"]
        for r in held.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    }
    assert means[1] - means[0] >= 0.2, means
    # the fit saw ~30% of docs; the held-out frame is the rest
    n = docs.count()
    assert held.count() == n - sample.count()


def test_interval_join_numeric_epoch_micros_axis(spark):
    """Numeric time axes are used in their own units: the old
    CAST(x AS TIMESTAMP) round-trip multiplies by 1e6 internally, so an
    epoch-MICROseconds axis (~1.7e15) wrapped the long range and corrupted
    bucket ids — qualifying pairs silently vanished."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.interval import (
        interval_join,
    )

    base = 1_700_000_000_000_000  # epoch micros
    pts = spark.createDataFrame([(1, base + 5)], "pid long, ts long")
    ivs = spark.createDataFrame(
        [(10, base, base + 10)], "iid long, start_ts long, end_ts long"
    )
    got = interval_join(pts, ivs, bucket_seconds=60).collect()
    assert [(r.pid, r.iid) for r in got] == [(1, 10)]
