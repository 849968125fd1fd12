"""Physical-plan regression tests (the `.explain` audit as assertions) and
golden pipeline-topology tests (SURVEY §5: collapse rounds are observable
behavior)."""

import contextlib
import io

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.collapse import (
    collapse_until_fits,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockSummarizer,
)


def _plan(spark, sf_dir, name):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark, sf_dir):
    p = _plan(spark, sf_dir, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p  # predicate reached the scan
    assert "l_comment" not in p  # column pruning
    assert "HashAggregate" in p  # partial+final hash agg


def test_star_join_broadcasts(spark, sf_dir):
    p = _plan(spark, sf_dir, "region_customer_stats")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_topk_uses_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(spark, sf_dir, "top_revenue_orders")


def test_semi_anti_joins_in_plan(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "customers_with_orders")
    assert "LeftAnti" in _plan(spark, sf_dir, "customers_without_orders")


def test_theta_join_is_broadcast_nested_loop(spark, sf_dir):
    assert "BroadcastNestedLoopJoin" in _plan(spark, sf_dir, "nation_foreign_regions")


def test_jvm_path_queries_have_no_python(spark, sf_dir):
    for q in ["doc_chunk_fixed100", "pipeline_truncated_mock", "doc_exact_dedup",
              "rouge1_per_doc", "doc_quality_scores", "corpus_pack_512",
              "doc_split_assign", "doc_repetition_stats", "doc_contamination_top20",
              "doc_tfidf_top3", "doc_unigram_logprob", "doc_feature_hash_embed"]:
        p = _plan(spark, sf_dir, q)
        assert "Python" not in p, f"{q} plan contains a Python stage"


def test_packing_window_is_sharded(spark, sf_dir):
    # the packing window must partition by shard — an empty partitionBy
    # would funnel the whole corpus through one task
    p = _plan(spark, sf_dir, "corpus_pack_512")
    assert "Window" in p
    assert "hashpartitioning(shard" in p  # window exchange keyed by shard
    assert "SinglePartition" not in p


def test_q14_broadcasts_part_and_pushes_month_filter(spark, sf_dir):
    p = _plan(spark, sf_dir, "promo_revenue_q14")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "GreaterThanOrEqual(l_shipdate" in p  # month filter reached the scan


def test_grouping_sets_expand_single_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "lineitem_grouping_sets")
    assert "Expand" in p
    # one scan node in the plan tree: a single pass over lineitem feeds
    # every grouping set (formatted output repeats the node in the detail
    # section, so count tree-edge occurrences)
    assert p.count("+- Scan parquet") == 1


def test_contamination_join_is_shingle_equi(spark, sf_dir):
    # candidates must come from the shingle equi-join, never a cross product
    p = _plan(spark, sf_dir, "doc_contamination_top20")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_partitioned_sink_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned parquet sink + partition pruning: a lang filter on
    the partitioned layout must prune directories at planning time."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    assert back.count() == docs.filter("lang = 'en'").count()


def test_collapse_round_topology(spark):
    # 16 chunks x 100 tokens, token_max 200, mock emits 50 tokens:
    # round 1: 8 groups x 50 = 400 -> still > 200
    # round 2: 2 groups (200-token budget / 50-token items -> 4 per group) x 50 = 100 <= 200
    df = spark.createDataFrame(
        [(1, i, "w " * 100, 100) for i in range(16)],
        ["doc_id", "chunk_idx", "text", "n_tokens"],
    )
    stats: dict = {}
    out = collapse_until_fits(df, MockSummarizer(50), token_max=200, stats=stats)
    assert stats["rounds"] == 2
    total = out.agg(F.sum("n_tokens")).first()[0]
    assert total <= 200


def test_collapse_no_rounds_when_within_budget(spark):
    df = spark.createDataFrame(
        [(1, 0, "tiny text", 2)], ["doc_id", "chunk_idx", "text", "n_tokens"]
    )
    stats: dict = {}
    collapse_until_fits(df, MockSummarizer(50), token_max=200, stats=stats).collect()
    assert stats["rounds"] == 0


def test_interval_join_is_hash_equi_not_nested_loop(spark, sf_dir):
    """The bucketed range join must plan as a hash equi-join on
    (user_id, bucket) — a BroadcastNestedLoopJoin here means the
    bucketization regressed to the naive theta join."""
    p = _plan(spark, sf_dir, "events_click_in_purchase_window")
    assert "BroadcastNestedLoopJoin" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)


def test_line_dedup_has_exactly_two_exchanges(spark, sf_dir):
    """Line dedup = one shuffle keyed by line, one back on the doc id —
    a third exchange means a derived column stopped riding the existing
    partitioning."""
    t = _tree(_plan(spark, sf_dir, "doc_line_dedup"))
    assert t.count("- Exchange") == 2, t


def _tree(plan_text):
    """The operator tree section of a formatted explain (the per-operator
    detail list below it repeats every operator name once more)."""
    return plan_text.split("\n\n(", 1)[0]


def test_star_banding_has_no_self_join(spark, sf_dir):
    """The star candidate stage is a window min over the band table, not a
    band self-join: the only joins in the plan tree are the two signature
    join-backs — a third join means the clique join crept back."""
    import re

    t = _tree(_plan(spark, sf_dir, "minhash_md5_star_dedup"))
    n_joins = len(re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", t))
    assert n_joins == 2, t
    assert "Window" in t  # the per-bucket rep min


def test_bloom_skip_plan_is_broadcast_only_for_membership(spark, sf_dir):
    """Bloom membership = k broadcast joins of the word table; the incoming
    corpus must not shuffle before the membership verdict."""
    p = _plan(spark, sf_dir, "doc_bloom_skip_existing")
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
