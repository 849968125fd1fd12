"""Plan shapes for the round-3 TPC-H silhouettes (plans/tpch_extra.py):
value parity lives in test_oracle_parity.py; these assert the PLANS scale —
subqueries decorrelate to semi/anti joins, the disjunctive Q19 factors its
join key out instead of going cartesian, Q13 keeps its outer join, and
every multi-way join stays broadcast/shuffle-hash/sort-merge."""

import pytest

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES

NEW_TPCH = [
    "q2_min_cost_supplier",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_inventory",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_latest_shipper",
]


def _plan(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", NEW_TPCH)
def test_no_cartesian_or_nested_loop_anywhere(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    # Q19's OR-of-conjunctions repeats the equi-join predicate in every
    # branch; if Catalyst failed to factor it out this would plan as a
    # BroadcastNestedLoopJoin over part x lineitem
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q21_decorrelates_to_semi_plus_anti(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_latest_shipper")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q16_not_in_is_null_aware_anti(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_part_variety")
    assert "LeftAnti" in plan


def test_q20_in_subquery_is_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q20_heavy_shippers")
    assert "LeftSemi" in plan


def test_q13_keeps_outer_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in plan


def test_q19_single_equi_join_with_residual(spark, sf_dir):
    # exactly one part<->lineitem join; the size/brand/quantity disjunction
    # must ride along as a join condition/filter, not multiply the joins
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    joins = sum(plan.count(j) for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
    assert joins == 1, plan


def test_q7_broadcasts_the_dimensions(spark, sf_dir):
    # nation (25 rows, twice) and supplier (100) must come in as broadcasts
    plan = _plan(spark, sf_dir, "q7_nation_trade_volume")
    assert plan.count("BroadcastHashJoin") >= 3, plan
