"""Round-4 curation additions: bloom skip-existing, mixture-rate solver,
keep-best dedup, unicode text normalization. Oracle parity runs in
test_oracle_parity.py; these pin operator semantics and edge cases."""

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
    normalize_text,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    dedup_keep_best,
    mixture_rates,
    skip_existing,
    skip_existing_bloom,
)


# --- skip_existing_bloom --------------------------------------------------


def _docs(spark, ids):
    return spark.createDataFrame([(i, f"t{i}") for i in ids], "doc_id long, text string")


def test_bloom_exact_equals_plain_skip_existing(spark):
    docs = _docs(spark, range(200))
    existing = _docs(spark, range(0, 200, 3)).select("doc_id")
    got = {r.doc_id for r in skip_existing_bloom(docs, existing).collect()}
    want = {r.doc_id for r in skip_existing(docs, existing).collect()}
    assert got == want
    assert all(i % 3 != 0 for i in got)


def test_bloom_inexact_has_no_false_negatives(spark):
    """exact=False may drop some new docs (false positives) but must NEVER
    let an existing doc through — the bloom no-false-negative guarantee.
    An undersized filter forces collisions to make the test meaningful."""
    docs = _docs(spark, range(500))
    existing = _docs(spark, range(0, 500, 2)).select("doc_id")
    out = {
        r.doc_id
        for r in skip_existing_bloom(
            docs, existing, num_bits=256, exact=False
        ).collect()
    }
    assert all(i % 2 == 1 for i in out)  # nothing existing leaks through
    new = {i for i in range(500) if i % 2 == 1}
    assert out <= new
    # with only 256 bits for 250 keys the filter is saturated enough that
    # SOME false positives must have occurred (sanity that the test bites)
    assert len(out) < len(new)


def test_bloom_empty_existing_passes_everything(spark):
    docs = _docs(spark, range(10))
    existing = _docs(spark, []).select("doc_id")
    assert skip_existing_bloom(docs, existing).count() == 10


def test_bloom_plan_has_no_docs_shuffle(spark):
    """The membership test must be broadcast joins — the incoming batch
    never shuffles."""
    docs = _docs(spark, range(50))
    existing = _docs(spark, range(25)).select("doc_id")
    plan = (
        skip_existing_bloom(docs, existing, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# --- mixture_rates --------------------------------------------------------


def test_mixture_rates_binding_source_and_shares(spark):
    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 600), ("c", 1000), ("d", 50)],
        "source string, n_tokens long",
    )
    out = {
        r.source: r
        for r in mixture_rates(
            df, {"a": 0.5, "b": 0.3, "c": 0.2}, mass_col="n_tokens"
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}  # 'd' outside the target: dropped
    # binding source: min(mass/share) = min(400, 2000, 5000) -> a, rate 1.0
    assert out["a"].rate == pytest.approx(1.0)
    assert out["a"].kept_mass == pytest.approx(200.0)
    # others downsample to share * T / mass
    assert out["b"].rate == pytest.approx(0.3 * 400 / 600)
    assert out["c"].rate == pytest.approx(0.2 * 400 / 1000)
    # achieved mixture is exactly the target
    total = sum(out[s].kept_mass for s in out)
    assert out["a"].kept_mass / total == pytest.approx(0.5)
    assert out["b"].kept_mass / total == pytest.approx(0.3)


def test_mixture_rates_normalizes_shares_and_validates(spark):
    df = spark.createDataFrame([("a", 10), ("b", 10)], "source string, m long")
    out = {r.source: r for r in mixture_rates(df, {"a": 2, "b": 2}, "m").collect()}
    assert out["a"].target_share == pytest.approx(0.5)
    with pytest.raises(ValueError):
        mixture_rates(df, {}, "m")
    with pytest.raises(ValueError):
        mixture_rates(df, {"a": 0.0}, "m")


# --- dedup_keep_best ------------------------------------------------------


def test_keep_best_prefers_score_then_min_id(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (9, 1)],
        "doc_id long, score long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 9)], "id1 long, id2 long"
    )
    kept = {
        r.doc_id for r in dedup_keep_best(docs, pairs, score_col="score").collect()
    }
    # cluster {1,2,3}: top score 99 tied between 2 and 3 -> min id 2
    # cluster {4,9}: 4 wins on score
    assert kept == {2, 4}


def test_keep_best_keeps_singletons(spark):
    docs = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, score long")
    pairs = spark.createDataFrame([], "id1 long, id2 long")
    assert dedup_keep_best(docs, pairs, score_col="score").count() == 2


# --- normalize_text -------------------------------------------------------


def test_normalize_text_folds_unicode(spark):
    cases = [
        ("a\r\nb\rc", "a\nb\nc"),  # CRLF / CR -> LF
        ("x\x00y\x07z", "xyz"),  # control chars stripped
        ("“q” ‘s’", '"q" \'s\''),  # curly quotes
        ("a–b—c−d", "a-b-c-d"),  # dashes + minus
        ("a b　c", "a b c"),  # unicode spaces
        ("a \t  b", "a b"),  # ws squeeze
        ("  line1 \n  line2  ", "line1\nline2"),  # trim around newlines
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "id long, t string"
    )
    got = {
        r.id: r.n for r in df.select("id", normalize_text("t").alias("n")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_normalize_text_is_idempotent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    once = normalize_text(F.concat(F.lit("“a—"), F.col("text"), F.lit("\r\n b ")))
    df = docs.select(once.alias("n1"), normalize_text(once).alias("n2"))
    assert df.filter(F.col("n1") != F.col("n2")).count() == 0


# --- line_dedup -----------------------------------------------------------


def test_line_dedup_keeps_first_occurrence_and_blanks(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        line_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha\nboiler\n\nbeta"),
            (2, "boiler\ngamma\n\nboiler"),
            (3, "alpha"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    # doc 1 is first everywhere: untouched, blank line preserved
    assert out[1].text == "alpha\nboiler\n\nbeta"
    assert out[1].n_removed == 0
    # doc 2 loses both 'boiler' repeats but keeps its blank + gamma
    assert out[2].text == "gamma\n"
    assert out[2].n_removed == 2
    assert out[2].n_lines == 4
    # doc 3's only line was seen in doc 1 -> empty husk
    assert out[3].text == ""
    assert out[3].n_removed == 1


def test_line_dedup_plan_has_exactly_two_shuffles(spark, sf_dir):
    """Pins the scale claim: one exchange keyed by the (salted) line for
    the rank window, one keyed by the doc id for reassembly — nothing
    pairwise, nothing extra."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        line_dedup,
    )

    import pyspark

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    # version-independent invariant: never pairwise, never a third shuffle
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    if pyspark.__version__.split(".")[:2] == ["4", "1"]:
        # exact operator count is pinned only on the tested Spark line —
        # AQE re-planning or operator renames on an upgrade shouldn't fail
        # this test without a behavioral regression
        assert plan.count("Exchange hashpartitioning") == 2, plan


def test_line_dedup_hash_and_text_keys_agree(spark, sf_dir):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        line_dedup,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(100)
        .select("doc_id", F.regexp_replace("text", " (\\S+ \\S+ \\S+)", "\n$1").alias("text"))
    )
    h = line_dedup(docs, dedup_key="hash").orderBy("doc_id").collect()
    t = line_dedup(docs, dedup_key="text").orderBy("doc_id").collect()
    assert [tuple(r) for r in h] == [tuple(r) for r in t]


# --- interval_join --------------------------------------------------------


def test_interval_join_matches_naive_range_join(spark, sf_dir):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        interval_join,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 45 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in interval_join(
            clicks, buys, bucket_seconds=600, point_time="ts", on="user_id"
        ).collect()
    }
    naive = {
        (r.click_id, r.purchase_id)
        for r in clicks.alias("c")
        .join(
            buys.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.ts") >= F.col("p.start_ts"))
            & (F.col("c.ts") < F.col("p.end_ts")),
        )
        .select("c.click_id", "p.purchase_id")
        .collect()
    }
    assert got == naive
    assert got  # non-degenerate


def test_interval_join_plan_is_equi_join_not_nested_loop(spark, sf_dir):
    """The whole point of bucketization: the physical plan must be a hash
    equi-join on (key, bucket), never the BroadcastNestedLoopJoin Spark
    falls back to for a bare range predicate."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        interval_join,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.select("user_id", F.col("event_id").alias("click_id"), "ts")
    buys = ev.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 45 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    plan = (
        interval_join(clicks, buys, bucket_seconds=600, point_time="ts", on="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import pyspark

    # version-independent invariant: the range predicate must not degrade
    # to a pairwise join
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    if pyspark.__version__.split(".")[:2] == ["4", "1"]:
        # positive operator-name check only on the tested Spark line
        assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_interval_join_half_open_boundaries(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        interval_join,
    )

    points = spark.createDataFrame(
        [(1, 100.0), (2, 150.0), (3, 200.0)], "pid long, ts double"
    )
    iv = spark.createDataFrame([(7, 100.0, 200.0)], "iid long, start_ts double, end_ts double")
    got = sorted(
        r.pid
        for r in interval_join(points, iv, bucket_seconds=30, point_time="ts").collect()
    )
    assert got == [1, 2]  # start inclusive, end exclusive


def test_interval_join_validates(spark):
    import pytest as _pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        interval_join,
    )

    df = spark.createDataFrame([(1, 1.0)], "a long, ts double")
    iv = spark.createDataFrame([(1, 0.0, 2.0)], "a long, start_ts double, end_ts double")
    with _pytest.raises(ValueError):
        interval_join(df, iv, bucket_seconds=0, point_time="ts")
    clash_iv = spark.createDataFrame(
        [(1, 0.0, 2.0, 9.0)], "a long, start_ts double, end_ts double, ts double"
    )
    with _pytest.raises(ValueError):
        interval_join(df, clash_iv, bucket_seconds=10, point_time="ts")


# --- star-edge LSH banding ------------------------------------------------


def test_star_candidates_give_identical_components(spark, sf_dir):
    """At threshold 0 (bucket equivalence feeding components), star edges
    span exactly the clique's connected components — same clustering from
    O(k) pairs instead of O(k^2)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        connected_components,
        unpersist_inputs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        minhash_md5_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").limit(200)
    clique = minhash_md5_pairs(docs, threshold=0.0)
    star = minhash_md5_pairs(docs, threshold=0.0, star=True)
    n_clique, n_star = clique.count(), star.count()
    assert n_star <= n_clique
    comp_c = {
        (r.doc_id, r.component)
        for r in connected_components(clique, nodes=docs).collect()
    }
    comp_s = {
        (r.doc_id, r.component)
        for r in connected_components(star, nodes=docs).collect()
    }
    assert comp_c == comp_s
    unpersist_inputs(clique)
    unpersist_inputs(star)


def test_star_candidates_edge_shape(spark):
    """Every star pair's id1 is its bucket's minimum: id1 < id2 always, and
    each id2 appears at most once per distinct rep."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        minhash_md5_signatures,
        minhash_lsh_star_candidates,
    )

    docs = spark.createDataFrame(
        [(i, "the same exact boilerplate text repeated for everyone") for i in range(30)]
        + [(100, "a completely different document about other things entirely")],
        "doc_id long, text string",
    )
    sigs = minhash_md5_signatures(docs)
    pairs = minhash_lsh_star_candidates(sigs, n_bands=4, n_hashes=16).collect()
    assert pairs  # the 30-clone bucket produced edges
    assert all(r.id1 < r.id2 for r in pairs)
    # 30 identical docs -> exactly 29 star edges from rep 0, not 435 clique pairs
    assert {(r.id1, r.id2) for r in pairs} == {(0, i) for i in range(1, 30)}


# --- script_ratios --------------------------------------------------------


def test_script_ratios_values(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
        script_ratios,
    )

    df = spark.createDataFrame(
        [
            (1, "hello world"),  # pure latin
            (2, "привет"),  # pure cyrillic
            (3, "ab гд 世界"),  # 2 + 2 + 2 letters
            (4, "123 !!!"),  # letterless
            (5, None),
        ],
        "id long, t string",
    )
    got = {r.id: r.s for r in df.select("id", script_ratios("t").alias("s")).collect()}
    assert got[1].latin_ratio == 1.0 and got[1].cyrillic_ratio == 0.0
    assert got[2].cyrillic_ratio == 1.0
    assert got[3].n_letters == 6
    assert got[3].latin_ratio == pytest.approx(1 / 3)
    assert got[3].han_ratio == pytest.approx(1 / 3)
    assert got[4].n_letters == 0 and got[4].latin_ratio == 0.0
    assert got[5].n_letters is None  # NULL text propagates, not a crash


# --- review-pass regression fixes (round 4) -------------------------------


def test_bloom_is_key_dtype_insensitive(spark):
    """xxhash64 is type-sensitive; the bloom hashes the key's string form
    so an int-typed batch against a long-typed curated corpus keeps the
    no-false-negative guarantee (review finding: existing docs leaked
    through as 'definitely new' under mixed dtypes)."""
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id int")
    existing = spark.createDataFrame([(i,) for i in range(0, 20, 2)], "doc_id long")
    got = {r.doc_id for r in skip_existing_bloom(docs, existing).collect()}
    assert got == {i for i in range(20) if i % 2 == 1}


def test_line_dedup_content_cannot_collide_with_blank_salt(spark):
    """A content line whose text spells the blank-salt pattern must not
    share a partition with a real blank line (review finding: either side
    could wrongly drop)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        line_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "x\n\ny"), (2, "b:1:1\nz")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(docs, dedup_key="text").collect()}
    assert out[1].text == "x\n\ny" and out[1].n_removed == 0
    assert out[2].text == "b:1:1\nz" and out[2].n_removed == 0


def test_line_dedup_null_text_survives_as_husk(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        line_dedup,
    )

    docs = spark.createDataFrame([(1, "a"), (2, None)], "doc_id long, text string")
    out = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert set(out) == {1, 2}  # review finding: doc 2 used to vanish
    assert out[2] == ""


def test_mixture_rates_absent_target_source_is_loud(spark):
    """A target source with no corpus rows keeps its output row (mass 0,
    rate 0) and forces T=0 — the unachievable mixture shows up as zero
    kept_mass everywhere instead of silently re-solving over present
    sources (review finding)."""
    df = spark.createDataFrame([("a", 100)], "source string, m long")
    out = {r.source: r for r in mixture_rates(df, {"a": 0.5, "b": 0.5}, "m").collect()}
    assert set(out) == {"a", "b"}
    assert out["b"].mass == 0 and out["b"].rate == 0.0
    assert out["a"].kept_mass == 0.0 and out["b"].kept_mass == 0.0


def test_interval_join_rejects_reserved_bucket_column(spark):
    import pytest as _pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        interval_join,
    )

    pts = spark.createDataFrame([(1, 1.0, 9.0)], "a long, ts double, _b double")
    iv = spark.createDataFrame([(1, 0.0, 2.0)], "a long, start_ts double, end_ts double")
    with _pytest.raises(ValueError):
        interval_join(pts, iv, bucket_seconds=10, point_time="ts")


def test_script_ratios_null_text_propagates_null_ratios(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
        script_ratios,
    )

    df = spark.createDataFrame([(1, None)], "id long, t string")
    row = df.select(script_ratios("t").alias("s")).first().s
    assert row.n_letters is None
    assert row.latin_ratio is None  # was 0.0: misreported NULL as letterless


def test_simhash_star_components_match_clique_without_verify(spark, sf_dir):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        connected_components,
        unpersist_inputs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        md5_hash32,
        simhash_near_dup_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").limit(200)
    kw = dict(max_hamming=32, bits=32, hash_col_fn=md5_hash32)  # no verify cut
    clique = simhash_near_dup_pairs(docs, **kw)
    star = simhash_near_dup_pairs(docs, star=True, **kw)
    assert star.count() <= clique.count()
    comp_c = {(r.doc_id, r.component) for r in connected_components(clique, nodes=docs).collect()}
    comp_s = {(r.doc_id, r.component) for r in connected_components(star, nodes=docs).collect()}
    assert comp_c == comp_s
    unpersist_inputs(clique)
    unpersist_inputs(star)


def test_simhash_star_hamming_is_vs_bucket_rep(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        md5_hash32,
        simhash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "identical boilerplate page content here") for i in range(10)],
        "doc_id long, text string",
    )
    pairs = simhash_near_dup_pairs(
        docs, star=True, max_hamming=0, bits=32, hash_col_fn=md5_hash32
    ).collect()
    # 10 identical docs: 9 star edges from rep 0, hamming 0
    assert {(r.id1, r.id2, r.hamming) for r in pairs} == {
        (0, i, 0) for i in range(1, 10)
    }


def test_incremental_pairs_equal_full_join_restricted_to_new(spark, sf_dir):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        minhash_incremental_pairs,
        unpersist_inputs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        minhash_md5_pairs,
        minhash_md5_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    full = minhash_md5_pairs(docs, threshold=0.0)
    want = {
        (r.id1, r.id2, round(r.est_jaccard, 6))
        for r in full.collect()
        if r.id1 >= 400 or r.id2 >= 400
    }
    sigs = minhash_md5_signatures(docs).persist()
    got_df = minhash_incremental_pairs(
        sigs.filter("doc_id >= 400"), sigs.filter("doc_id < 400"),
        n_hashes=16, n_bands=4, threshold=0.0,
    )
    got = {(r.id1, r.id2, round(r.est_jaccard, 6)) for r in got_df.collect()}
    assert got == want
    unpersist_inputs(full)
    sigs.unpersist()


def test_incremental_pairs_empty_batch(spark, sf_dir):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        minhash_incremental_pairs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        minhash_md5_signatures,
    )

    sigs = minhash_md5_signatures(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").limit(50)
    )
    empty = sigs.filter("doc_id < 0")
    assert minhash_incremental_pairs(empty, sigs, n_hashes=16, n_bands=4).count() == 0


def test_iqr_outliers_keeps_null_group_rows(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.aggregate import (
        iqr_outliers,
    )

    df = spark.createDataFrame(
        [(1, "en", 10.0), (2, "en", 12.0), (3, None, 5.0), (4, None, 500.0)],
        "id long, lang string, v double",
    )
    out = iqr_outliers(df, "v", by="lang").collect()
    assert len(out) == 4  # NULL-lang rows flagged within their own stratum
    by_id = {r.id: r for r in out}
    assert by_id[3].q1 is not None


def test_asof_tolerance_numeric_axis_no_timestamp_overflow(spark):
    """Numeric time columns subtract in native units — an epoch-microseconds
    axis (1.7e15) must not overflow through a timestamp cast into
    all-NULL matches (review finding)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        asof_join,
    )

    us = 1.7e15  # epoch microseconds scale
    left = spark.createDataFrame([(1, us + 5_000_000.0)], "k long, ts double")
    right = spark.createDataFrame([(1, us, "q")], "k long, ts double, tag string")
    row = asof_join(
        left, right, on="k", tolerance_seconds=10_000_000.0  # native units
    ).first()
    assert row.tag_right == "q"


def test_rrf_fuse_empty_rankings_raises(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
        rrf_fuse,
    )

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_incremental_pairs_exclude_sentinel_docs(spark):
    """Content-free docs (sentinel signatures) must never pair — a batch of
    empty docs against a corpus with empty docs previously reported
    est_jaccard 1.0 for every such pair (review finding)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        minhash_incremental_pairs,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        minhash_signatures,
    )

    new = spark.createDataFrame([(100, ""), (101, "x")], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, ""), (2, "y z")], "doc_id long, text string")
    pairs = minhash_incremental_pairs(
        minhash_signatures(new), minhash_signatures(corpus), threshold=0.0
    ).collect()
    ids = {i for r in pairs for i in (r.id1, r.id2)}
    assert 100 not in ids and 1 not in ids  # sentinel docs never band


def test_compression_ratio_monotonicity_and_nulls(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
        compression_ratio_udf,
    )

    import random

    rng = random.Random(7)
    rand_text = "".join(chr(33 + rng.randrange(90)) for _ in range(2000))
    docs = spark.createDataFrame(
        [
            (1, "spam ham " * 250),  # highly repetitive
            (2, "the quick brown fox jumps over the lazy dog and keeps going " * 30),
            (3, rand_text),  # near-incompressible
            (4, ""),
            (5, None),
        ],
        "id long, t string",
    )
    got = {
        r.id: r.cr
        for r in docs.select(
            "id", compression_ratio_udf()("t").alias("cr")
        ).collect()
    }
    assert got[1] < got[2] < got[3]
    assert got[3] > 0.8
    assert got[4] is None and got[5] is None


def test_hamming_pairs_validates_band_parameters(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        hamming_near_dup_pairs,
    )

    sigs = spark.createDataFrame([(1, 5)], "doc_id long, simhash long")
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(sigs, bits=8, n_bands=16)  # zero-width bands
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(sigs, bits=64, n_bands=5)  # uneven split


def test_corpus_diff_statuses(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "gone")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now different"), (4, "brand new"), (5, " same ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added", 5: "added"}
    # fingerprint is whitespace-normalized: ' same ' vs 'same' would be
    # 'unchanged' had doc 5 existed before

    # sidecar path: precomputed fingerprint frames give the identical diff
    # without corpus_diff ever seeing text (the nightly O(keys) audit)
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
        doc_fingerprint_nullsafe,
    )

    old_fp = old.select("doc_id", doc_fingerprint_nullsafe(F.col("text")).alias("fp"))
    new_fp = new.select("doc_id", doc_fingerprint_nullsafe(F.col("text")).alias("fp"))
    via_fp = {
        r.doc_id: r.status
        for r in corpus_diff(old_fp, new_fp, fingerprint_col="fp").collect()
    }
    assert via_fp == got


# --- learned quality classifier -------------------------------------------


def test_quality_classifier_learns_separable_corpus(spark):
    """Train on a linearly separable synthetic corpus (good docs use one
    vocabulary, bad docs another — disjoint hash buckets with high
    probability) and verify held-out scores separate the classes."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        score_quality,
        train_quality_classifier,
    )

    good_words = ["alpha", "bravo", "charlie", "delta", "echo"]
    bad_words = ["zulu", "yankee", "xray", "whisky", "victor"]
    rows = []
    for i in range(120):
        words = good_words if i % 2 == 0 else bad_words
        text = " ".join(words[(i + j) % 5] for j in range(12))
        rows.append((i, text, 1 if i % 2 == 0 else 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    train = df.filter("doc_id < 100")
    held = df.filter("doc_id >= 100")

    coefs, intercept = train_quality_classifier(train, dims=64)
    assert len(coefs) == 64
    scored = {
        r.doc_id: r.quality_prob
        for r in score_quality(held, coefs, intercept).collect()
    }
    for i in range(100, 120):
        if i % 2 == 0:
            assert scored[i] > 0.9, (i, scored[i])
        else:
            assert scored[i] < 0.1, (i, scored[i])


def test_score_quality_tokenless_doc_scores_prior(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        score_quality,
    )
    import math

    docs = spark.createDataFrame([(1, "has words"), (2, "")], "doc_id long, text string")
    got = {r.doc_id: r.quality_prob for r in score_quality(docs, [0.5] * 64, 0.3).collect()}
    assert got[2] == pytest.approx(1 / (1 + math.exp(-0.3)))


def test_bloom_no_false_negatives_across_numeric_families(spark):
    """docs double 5.0 vs existing bigint 5: the exact anti-join coerces
    and matches, so the bloom must too — hashing each side's OWN string
    form ('5.0' vs '5') made the existing doc test 'definitely new' and
    leak through even in exact mode."""
    docs = spark.createDataFrame([(5.0, "x"), (6.5, "y")], "doc_id double, text string")
    existing = spark.createDataFrame([(5,)], "doc_id long")
    out = skip_existing_bloom(docs, existing, expected_items=16)
    assert [r.doc_id for r in out.collect()] == [6.5]


def test_pack_sequences_string_ids_shard_by_hash(spark):
    """String ids must shard by hash: `id % n` coerces through double and
    yields NULL for every row — the whole corpus in one null-shard window
    partition."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [("doc_%05d" % i, 30) for i in range(40)], "doc_id string, n_tokens int"
    )
    out = pack_sequences(docs, max_tokens=128, n_shards=4, mode="greedy")
    shards = {r.shard for r in out.select("shard").distinct().collect()}
    assert None not in shards and shards <= {0, 1, 2, 3} and len(shards) > 1
