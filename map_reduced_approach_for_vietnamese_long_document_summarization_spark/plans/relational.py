"""Harness query registry: Spark DataFrame queries + DuckDB oracle SQL twins.

Each entry maps one operator family from SURVEY §2 (or a north-star
extension) onto the driver's synthetic tables. Conventions that keep the
order-insensitive value-hash comparison honest:

* every computed column is aliased identically on both sides;
* floating aggregates are ``round()``-ed on both sides (summation order
  differs between engines at the ulp level);
* DuckDB ``sum(integer)`` returns HUGEINT and ``floor`` returns DOUBLE —
  oracles cast to BIGINT explicitly to match Spark's types;
* computed time buckets are returned as epoch seconds (BIGINT), never raw
  timestamps.

Scale notes are attached per query: what broadcasts, what shuffles, and why
the plan survives 100 TB.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import clean_thinking_tokens, tokenize_ws, truncate_tokens, ws_token_count
from ..functions.textstats import doc_fingerprint, language_id, quality_score
from ..operators.chunking import chunk_fixed_tokens
from ..operators.collapse import bucket_running_sum
from ..sources.tables import load_table as _t_impl

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    return _t_impl(spark, sf_dir, name, spread=spread)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.5 aggregations — TPC-H-style hash aggregates
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)            AS sum_disc_price,
       round(avg(l_quantity), 4)                                    AS avg_qty,
       round(avg(l_extendedprice), 4)                               AS avg_price,
       round(avg(l_discount), 6)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (A1/A2/A3): partial+final hash agg; the filter pushes
    to the parquet scan. One shuffle on the 2-key group — scales linearly."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "segment_stats",
    oracle="""
SELECT c_mktsegment,
       count(*)                         AS n_customers,
       round(avg(c_acctbal), 4)         AS avg_bal,
       round(min(c_acctbal), 2)         AS min_bal,
       round(max(c_acctbal), 2)         AS max_bal,
       round(stddev_pop(c_acctbal), 4)  AS std_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-moments shape (A2): mean/std(pop)/min/max, matching the
    reference's numpy population std (evaluate_summaries_semantic.py:600-617)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.stddev_pop("c_acctbal"), 4).alias("std_bal"),
    )


@query(
    "price_histogram",
    oracle="""
SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END              AS bucket,
       count(*)                         AS n_orders,
       round(sum(o_totalprice), 2)      AS total
FROM orders
GROUP BY 1
""",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed histogram (A4) — the sim >=0.7 / 0.4-0.7 / <0.4 counting
    pattern (evaluate_summaries_semantic.py:661-671) as conditional CASE agg."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "priority_distinct_customers",
    oracle="""
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*)                  AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def priority_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (SURVEY §2.5 'free in Spark' row)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "region_nation_rollup",
    oracle="""
SELECT r_name, n_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets over a broadcast star join: nation/region are
    tiny dims — the 100 TB fact side never shuffles for the join."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "returnflag_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def returnflag_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "region_customer_stats",
    oracle="""
SELECT r_name,
       count(*)                 AS n_customers,
       round(avg(c_acctbal), 4) AS avg_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def region_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join chain (J1/J2): dims broadcast, fact streams."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


@query(
    "top_revenue_orders",
    oracle="""
SELECT o_orderkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, c_name
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + TakeOrderedAndProject (O2). Explicit o_orderkey
    tiebreaker keeps the limit deterministic under any partitioning.

    Plan (round-9 probe: 1.8x over the join-then-aggregate shape):
    revenue pre-aggregates on l_orderkey ALONE — a map-side-combined hash
    agg over the fact table's single long key — before any join, because
    o_orderkey is unique in orders and functionally determines c_name;
    grouping the 3-way join output by (o_orderkey, c_name) shuffled every
    joined fact row with a string in the key. customer attaches by
    broadcast. At 100 TB this is the difference between shuffling the
    fact table once on a long vs shuffling the widened join output."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    rev = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    return (
        rev.join(o, rev.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "shipping_priority_q3",
    oracle="""
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(epoch(o_orderdate) AS BIGINT)                AS orderdate_epoch,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on all three tables push to the
    scans, the join tree re-orders under Catalyst, top-10 via
    TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
    )


@query(
    "local_supplier_volume_q5",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
""",
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join with the customer-nation = supplier-nation
    'local volume' conjunct; dims broadcast, facts hash-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "returned_item_customers_q10",
    oracle="""
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_item_customers_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue — selective returnflag
    filter on the fact side, broadcast dim, top-20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "customers_with_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the reference's filename-set intersection (F1)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the 'warn + skip missing reference' report (F2/F3)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "late_shipment_counts",
    oracle="""
SELECT o_orderkey, count(*) AS n_late
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
             AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderkey
""",
)
def late_shipment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + non-equi conjunct join (SURVEY §2.3 closing note): the equi part
    keeps it a hash join; the range predicate evaluates post-probe."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_late"))


# ---------------------------------------------------------------------------
# §2.6 windows / sorts / top-k
# ---------------------------------------------------------------------------


@query(
    "top2_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) t
WHERE rnk <= 2
""",
)
def top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (O3/A5): rank window with explicit tiebreak."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@query(
    "customer_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_spend
FROM orders
""",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum frame (O4/D5's window shape)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "order_gap_days",
    oracle="""
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                                                      ORDER BY o_orderdate, o_orderkey),
                 CAST(o_orderdate AS DATE)) AS gap_days
FROM orders
""",
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() refine-chain shape (O4) + date arithmetic (C13 family)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate").cast("date")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev).alias("gap_days"),
    )


@query(
    "orders_in_trailing_90d",
    oracle="""
SELECT o_custkey, o_orderkey,
       count(*) OVER (PARTITION BY o_custkey
                      ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
         AS n_orders_90d
FROM orders
""",
)
def orders_in_trailing_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame window (value-based, not row-based): per order, how many
    of the same customer's orders fall in the trailing 90 days. Ordered by
    epoch seconds so the frame bound is 90*86400."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_orders_90d")
    )


@query(
    "nation_top_customer",
    oracle="""
SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal FROM (
  SELECT n_name, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey) t
WHERE rn = 1
""",
)
def nation_top_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max per group (A5, run_full_evaluation_pipeline.py:909-921) as a
    deterministic rank window (max_by's tie-break is engine-defined)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


@query(
    "cheapest_parts",
    oracle="""
SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
FROM part
ORDER BY p_retailprice, p_partkey
LIMIT 25
""",
)
def cheapest_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit (F4/O2) -> TakeOrderedAndProject, no full sort at scale."""
    p = _t(spark, sf_dir, "part")
    return (
        p.orderBy("p_retailprice", "p_partkey")
        .limit(25)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
    )


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@query(
    "part_heavy_and_light",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
INTERSECT
SELECT l_partkey FROM lineitem WHERE l_quantity <= 5
""",
)
def part_heavy_and_light(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (§2.7) — parts ordered in both extreme quantities."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 45)
        .select("l_partkey")
        .intersect(li.filter(F.col("l_quantity") <= 5).select("l_partkey"))
    )


@query(
    "part_heavy_only",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
EXCEPT
SELECT l_partkey FROM lineitem WHERE l_quantity <= 5
""",
)
def part_heavy_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — the missing-ref report's moral equivalent (§2.7)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 45)
        .select("l_partkey")
        .subtract(li.filter(F.col("l_quantity") <= 5).select("l_partkey"))
    )


@query(
    "part_both_flags_all",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
""",
)
def part_both_flags_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (duplicate cardinality = min of the sides)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_partkey")
        .intersectAll(li.filter(F.col("l_returnflag") == "A").select("l_partkey"))
    )


@query(
    "lang_source_roster",
    oracle="""
SELECT lang,
       array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
       count(DISTINCT source)                                 AS n_sources
FROM documents
GROUP BY lang
""",
)
def lang_source_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation surface: per-language sorted distinct source roster,
    rendered to a string so the value-hash is representation-independent."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "doc_keyword_mentions",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '\\b(join|merge|sort)\\b'))  AS n_mentions,
       len(regexp_extract_all(text, '\\bstream\\w*'))            AS n_stream_terms
FROM documents
""",
)
def doc_keyword_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all surface: occurrence counting with word boundaries
    and prefix patterns."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\b(join|merge|sort)\b"), 0)).alias(
            "n_mentions"
        ),
        F.size(F.regexp_extract_all("text", F.lit(r"\bstream\w*"), 0)).alias(
            "n_stream_terms"
        ),
    )


@query(
    "priority_slices_union",
    oracle="""
SELECT 'urgent' AS slice, o_orderkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT 'low' AS slice, o_orderkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_orderpriority = '5-LOW'
""",
)
def priority_slices_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName stacking (§2.7) — per-model result-stacking shape."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("slice"), "o_orderkey", F.round("o_totalprice", 2).alias("total")
    )
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.lit("low").alias("slice"), "o_orderkey", F.round("o_totalprice", 2).alias("total")
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# events: time windows, sessionization, JSON (§2.10 batch twins)
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_10min",
    oracle="""
SELECT CAST(epoch(time_bucket(INTERVAL 10 MINUTE, ts)) AS BIGINT) AS window_start,
       event_type,
       count(*)              AS n_events,
       round(sum(value), 4)  AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (batch twin of the streaming agg §2.10);
    bucket returned as epoch seconds, never a raw timestamp."""
    e = _t(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sessionization",
    oracle="""
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*)                         AS n_events
FROM d GROUP BY user_id
""",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap): Spark's session_window in batch mode;
    oracle is the classic gaps-and-islands rewrite with matching >= gap
    boundary semantics."""
    e = _t(spark, sf_dir, "events")
    sessions = e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events")
    )


@query(
    "events_sliding_10m_5m",
    oracle="""
WITH panes AS (
  SELECT CAST(epoch(time_bucket(INTERVAL 5 MINUTE, ts)) AS BIGINT) AS window_start
  FROM events
  UNION ALL
  SELECT CAST(epoch(time_bucket(INTERVAL 5 MINUTE, ts)) AS BIGINT) - 300
  FROM events)
SELECT window_start, count(*) AS n_events
FROM panes GROUP BY window_start
""",
)
def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window, batch twin of streaming.sliding_event_counts:
    10-minute windows every 5 minutes — each event lands in exactly two
    panes; the oracle materializes both pane starts per event."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_timestamp("w.start").alias("window_start"), "n_events")
    )


@query(
    "events_user_pivot",
    oracle="""
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS clicks,
       count(*) FILTER (event_type = 'view')     AS views,
       count(*) FILTER (event_type = 'purchase') AS purchases,
       round(sum(value), 4)                      AS total_value
FROM events
GROUP BY user_id
""",
)
def events_user_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (A4/A7 shape)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "events_json_props",
    oracle="""
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
       count(*) AS n
FROM events
GROUP BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (§2.8 closing note: get_json_object)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# documents: the reference's text operators on the harness corpus
# ---------------------------------------------------------------------------

# DuckDB twin of functions.text.tokenize_ws (ASCII-\s contract, see tokenize_ws)
_DUCK_TOKS = (
    "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') END"
)

# case-folded token stream: tokens of lower(text) — the exact twin of the
# engine's term_postings tokenization (lower() maps nothing to or from
# whitespace, so folding the string first equals folding each token)
_DUCK_TOKS_LOWER = _DUCK_TOKS.replace("(text,", "(lower(text),")
# the derivation is a textual substitution: fail at import time if a
# reword of _DUCK_TOKS ever stops it matching (a silent no-op here would
# leave every lexical oracle comparing against a case-sensitive token set)
assert _DUCK_TOKS_LOWER.count("lower(text)") == 2, "_DUCK_TOKS reworded"


@query(
    "doc_stats_by_lang",
    oracle=f"""
SELECT lang,
       count(*)                                   AS n_docs,
       CAST(sum(n_chars) AS BIGINT)               AS total_chars,
       round(avg(len({_DUCK_TOKS})), 4)           AS avg_tokens
FROM documents
GROUP BY lang
""",
)
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus totals (A1, utils/calculate_tokens.py:86-101): count/sum/avg of
    char + whitespace-token counts, grouped by language."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(ws_token_count("text")), 4).alias("avg_tokens"),
    )


@query(
    "doc_clean_thinking",
    oracle="""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(
              '<think>secret reasoning</think>\n\n\n' || text,
              '(?is)<think>.*?</think>', '', 'g'),
              '(?is)<thinking>.*?</thinking>', '', 'g'),
              '(?is)<thought>.*?</thought>', '', 'g'),
              '(?is)<reasoning>.*?</reasoning>', '', 'g'),
              '(?is)<analysis>.*?</analysis>', '', 'g'),
              '\n\\s*\n\\s*\n', '\n\n', 'g'),
              '^\\s+|\\s+$', '', 'g')) AS clean_hash
FROM documents
""",
)
def doc_clean_thinking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thinking-token strip (F5/C4): each doc is wrapped with an injected
    <think> block, cleaned with the reference's 5-pattern chain, and hashed.
    A wrong regex (missed tag, greedy match, unstripped whitespace) breaks
    the hash for every row."""
    d = _t(spark, sf_dir, "documents")
    wrapped = F.concat(F.lit("<think>secret reasoning</think>\n\n\n"), F.col("text"))
    return d.select("doc_id", F.md5(clean_thinking_tokens(wrapped)).alias("clean_hash"))


@query(
    "doc_truncate_first50",
    oracle=f"""
SELECT doc_id,
       array_to_string(list_slice({_DUCK_TOKS}, 1, 50), ' ') AS truncated,
       least(len({_DUCK_TOKS}), 50)                          AS n_tokens
FROM documents
""",
)
def doc_truncate_first50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level truncation (F6, runners/run_summarization_ollama.py:9-13)."""
    d = _t(spark, sf_dir, "documents")
    trunc = truncate_tokens("text", 50)
    return d.select(
        "doc_id",
        trunc.alias("truncated"),
        F.least(ws_token_count("text"), F.lit(50)).alias("n_tokens"),
    )


@query(
    "doc_exact_dedup",
    oracle="""
SELECT md5(regexp_replace(regexp_replace(text, '\\s+', ' ', 'g'), '^ +| +$', '', 'g'))
         AS fingerprint,
       count(*)                    AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM documents
GROUP BY 1
""",
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint (north-star): hash-groupBy on a
    whitespace-normalized md5 — one shuffle on the hash, scales to 100 TB
    because only (hash, count, keeper) survive the map side."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(doc_fingerprint("text").alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


@query(
    "doc_chunk_fixed100",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             greatest(1, CAST(ceil(len(toks) / 100.0) AS INT)) AS nc
      FROM t),
x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM n)
SELECT doc_id,
       CAST(i AS INT)                                        AS chunk_idx,
       md5(array_to_string(toks[i*100+1 : (i+1)*100], ' '))  AS chunk_hash,
       len(toks[i*100+1 : (i+1)*100])                        AS n_tokens
FROM x
""",
)
def doc_chunk_fixed100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token chunk explode (D1's oracle-checkable twin): one doc row ->
    ceil(n/100) ordered chunk rows, entirely in whole-stage codegen."""
    d = _t(spark, sf_dir, "documents")
    chunks = chunk_fixed_tokens(d, 100)
    return chunks.select(
        "doc_id", "chunk_idx", F.md5("chunk").alias("chunk_hash"), "n_tokens"
    )


@query(
    "doc_collapse_buckets",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             greatest(1, CAST(ceil(len(toks) / 20.0) AS INT)) AS nc
      FROM t),
x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM n),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         len(toks[i*20+1 : (i+1)*20]) AS n_tokens
  FROM x)
SELECT doc_id, chunk_idx,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_idx
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / 25.0) AS INT) AS group_id
FROM chunks
""",
)
def doc_collapse_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-bounded collapse grouping (D5) as the running-sum window bucket:
    20-token chunks packed into 25-token groups by starting offset."""
    d = _t(spark, sf_dir, "documents")
    chunks = chunk_fixed_tokens(d, 20).select("doc_id", "chunk_idx", "n_tokens")
    return bucket_running_sum(chunks, 25).select("doc_id", "chunk_idx", "group_id")


@query(
    "doc_greedy_buckets",
    oracle=f"""
WITH RECURSIVE t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             greatest(1, CAST(ceil(len(toks) / 20.0) AS INT)) AS nc
      FROM t),
x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM n),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         len(toks[i*20+1 : (i+1)*20]) AS n_tokens
  FROM x),
walk AS (
  SELECT doc_id, chunk_idx, n_tokens, 0 AS gid, CAST(n_tokens AS BIGINT) AS acc
  FROM chunks WHERE chunk_idx = 0
  UNION ALL
  SELECT c.doc_id, c.chunk_idx, c.n_tokens,
         CASE WHEN w.acc > 0 AND w.acc + c.n_tokens > 25
              THEN w.gid + 1 ELSE w.gid END,
         CASE WHEN w.acc > 0 AND w.acc + c.n_tokens > 25
              THEN CAST(c.n_tokens AS BIGINT) ELSE w.acc + c.n_tokens END
  FROM walk w JOIN chunks c
    ON c.doc_id = w.doc_id AND c.chunk_idx = w.chunk_idx + 1)
SELECT doc_id, chunk_idx, gid AS group_id FROM walk
""",
)
def doc_greedy_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FAITHFUL greedy packing (D5, the reference's split_list_of_docs:
    new group when adding would exceed token_max) — oracle-checked: Spark
    runs the JVM aggregate-fold; DuckDB replays the same sequential walk as
    a recursive CTE. Complements doc_collapse_buckets' running-sum
    approximation."""
    d = _t(spark, sf_dir, "documents")
    chunks = chunk_fixed_tokens(d, 20).select("doc_id", "chunk_idx", "n_tokens")
    from ..operators.collapse import bucket_by_token_budget

    out = bucket_by_token_budget(chunks, 25)
    return out.select("doc_id", "chunk_idx", "group_id")


@query(
    "mock_collapse_level",
    oracle=f"""
WITH RECURSIVE t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             greatest(1, CAST(ceil(len(toks) / 60.0) AS INT)) AS nc
      FROM t),
x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM n),
-- map stage: chunk(60) then mock-summarize (first 24 tokens of each chunk)
mapped AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         array_to_string(toks[i*60+1 : least((i+1)*60, i*60+24)], ' ') AS summary,
         least(greatest(len(toks) - i*60, 0), 24) AS n_tokens
  FROM x),
-- greedy packing of summaries into <=50-token groups (split_list_of_docs)
walk AS (
  SELECT doc_id, chunk_idx, n_tokens, 0 AS gid, CAST(n_tokens AS BIGINT) AS acc
  FROM mapped WHERE chunk_idx = 0
  UNION ALL
  SELECT m.doc_id, m.chunk_idx, m.n_tokens,
         CASE WHEN w.acc > 0 AND w.acc + m.n_tokens > 50
              THEN w.gid + 1 ELSE w.gid END,
         CASE WHEN w.acc > 0 AND w.acc + m.n_tokens > 50
              THEN CAST(m.n_tokens AS BIGINT) ELSE w.acc + m.n_tokens END
  FROM walk w JOIN mapped m
    ON m.doc_id = w.doc_id AND m.chunk_idx = w.chunk_idx + 1),
-- reduce: concat each group's summaries in order, mock-summarize the concat
grouped AS (
  SELECT m.doc_id, w.gid AS group_id,
         string_agg(m.summary, e'\n\n' ORDER BY m.chunk_idx) AS joined
  FROM mapped m JOIN walk w
    ON m.doc_id = w.doc_id AND m.chunk_idx = w.chunk_idx
  GROUP BY m.doc_id, w.gid)
SELECT doc_id, group_id,
       md5(array_to_string(list_slice(
             regexp_split_to_array(regexp_replace(joined, '^\\s+|\\s+$', '', 'g'), '\\s+'),
             1, 24), ' ')) AS reduced_hash
FROM grouped
""",
)
def mock_collapse_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One COMPLETE collapse level oracle-checked end-to-end (D2+D5+D6):
    fixed-token chunking -> mock map -> faithful greedy bucketing -> ordered
    group concat -> mock reduce. Spark runs the engine's real operators
    (chunk_fixed_tokens, Summarizer.summarize_df, bucket_by_token_budget,
    reduce_groups); DuckDB replays the identical dataflow with a recursive
    CTE for the greedy walk."""
    from ..operators.collapse import bucket_by_token_budget, reduce_groups
    from ..summarize import MockSummarizer

    d = _t(spark, sf_dir, "documents")
    s = MockSummarizer(24)
    chunks = chunk_fixed_tokens(d, 60)
    mapped = s.summarize_df(chunks, "chunk", "summary").select(
        "doc_id",
        "chunk_idx",
        F.col("summary").alias("text"),
        F.least(F.col("n_tokens"), F.lit(24)).alias("n_tokens"),
    )
    bucketed = bucket_by_token_budget(mapped, 50)
    reduced = reduce_groups(bucketed, s, ("doc_id", "group_id"))
    return reduced.select("doc_id", "group_id", F.md5("text").alias("reduced_hash"))


def _collapse_loop_level_sql(i: int, token_max: int = 16, k: int = 8) -> str:
    """One unrolled collapse-loop level as DuckDB CTEs: totals -> over-budget
    doc set -> recursive greedy walk -> mock group-reduce -> pass-through
    union. MATERIALIZED hints are load-bearing: without them the chained
    level CTEs re-evaluate exponentially."""
    p, c = f"L{i}", f"L{i + 1}"
    return f"""
tot{i} AS MATERIALIZED (SELECT doc_id, sum(n_tokens) AS tot FROM {p} GROUP BY doc_id),
over{i} AS MATERIALIZED (SELECT doc_id FROM tot{i} WHERE tot > {token_max}),
walk{i} AS MATERIALIZED (
  WITH RECURSIVE w{i} AS (
    SELECT l.doc_id, l.chunk_idx, l.n_tokens, 0 AS gid, CAST(l.n_tokens AS BIGINT) AS acc
    FROM {p} l JOIN over{i} o ON l.doc_id = o.doc_id
    WHERE l.chunk_idx = 0
    UNION ALL
    SELECT nx.doc_id, nx.chunk_idx, nx.n_tokens,
           CASE WHEN w.acc > 0 AND w.acc + nx.n_tokens > {token_max}
                THEN w.gid + 1 ELSE w.gid END,
           CASE WHEN w.acc > 0 AND w.acc + nx.n_tokens > {token_max}
                THEN CAST(nx.n_tokens AS BIGINT) ELSE w.acc + nx.n_tokens END
    FROM w{i} w JOIN {p} nx ON nx.doc_id = w.doc_id AND nx.chunk_idx = w.chunk_idx + 1)
  SELECT * FROM w{i}),
red{i} AS MATERIALIZED (
  SELECT l.doc_id, CAST(w.gid AS INT) AS chunk_idx,
         array_to_string(list_slice(
           regexp_split_to_array(string_agg(l.summary, ' ' ORDER BY l.chunk_idx), ' '),
           1, {k}), ' ') AS summary,
         least({k}, CAST(sum(l.n_tokens) AS INT)) AS n_tokens
  FROM {p} l JOIN walk{i} w ON l.doc_id = w.doc_id AND l.chunk_idx = w.chunk_idx
  GROUP BY l.doc_id, w.gid),
{c} AS MATERIALIZED (
  SELECT l.* FROM {p} l LEFT JOIN over{i} o ON l.doc_id = o.doc_id WHERE o.doc_id IS NULL
  UNION ALL
  SELECT doc_id, chunk_idx, n_tokens, summary FROM red{i})
"""


@query(
    "mock_collapse_loop",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks, greatest(1, CAST(ceil(len(toks) / 10.0) AS INT)) AS nc FROM t),
x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM n),
L0 AS MATERIALIZED (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         least(greatest(len(toks) - i*10, 0), 8) AS n_tokens,
         array_to_string(toks[i*10+1 : least((i+1)*10, i*10+8)], ' ') AS summary
  FROM x),
{_collapse_loop_level_sql(0)}, {_collapse_loop_level_sql(1)},
{_collapse_loop_level_sql(2)}, {_collapse_loop_level_sql(3)},
{_collapse_loop_level_sql(4)}, {_collapse_loop_level_sql(5)}
SELECT doc_id, chunk_idx, md5(summary) AS s_hash, n_tokens FROM L6
""",
)
def mock_collapse_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL recursive collapse convergence loop (D7) oracle-checked:
    chunk(10) -> mock map(8) -> collapse_until_fits(token_max=16), which on
    this corpus takes up to 3 rounds per doc (10 chunks -> 5 -> 3 -> 2) with
    early per-doc exit. The oracle unrolls SIX loop levels in DuckDB — each
    a greedy recursive-CTE walk + mock reduce + converged-doc pass-through —
    so the driver loop's split/reduce/union semantics themselves are
    cross-engine verified, not just the single level.

    Precondition: six levels cover docs up to ~1,500 tokens (each round
    roughly halves the summary count; harness docs are <= 100 tokens, 3
    rounds). A corpus regenerated with far larger docs would need more
    unrolled levels — the mismatch would surface as a parity failure here,
    not silently."""
    from ..operators.collapse import collapse_until_fits
    from ..summarize import MockSummarizer

    d = _t(spark, sf_dir, "documents")
    s = MockSummarizer(8)
    chunks = chunk_fixed_tokens(d, 10)
    mapped = s.summarize_df(chunks, "chunk", "summary").select(
        "doc_id",
        "chunk_idx",
        F.col("summary").alias("text"),
        F.least(F.col("n_tokens"), F.lit(8)).alias("n_tokens"),
    )
    out = collapse_until_fits(mapped, s, token_max=16, max_rounds=10)
    return out.select(
        "doc_id", "chunk_idx", F.md5("text").alias("s_hash"), "n_tokens"
    )


@query(
    "doc_quality_scores",
    oracle="""
WITH s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
              ELSE len(regexp_split_to_array(
                     regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens,
         length(regexp_replace(text, '\\s+', '', 'g')) AS n_compact,
         length(regexp_replace(regexp_replace(text, '\\s+', '', 'g'),
                               '[^\\p{L}\\p{N}]', '', 'g')) AS n_alpha
  FROM documents)
SELECT doc_id,
       round((least(1.0, n_chars / 50.0)
              + CASE WHEN n_tokens > 0
                      AND n_compact * 1.0 / n_tokens BETWEEN 3.0 AND 12.0
                     THEN 1.0 ELSE 0.0 END
              + CASE WHEN n_compact > 0 THEN n_alpha * 1.0 / n_compact ELSE 0.0 END
             ) / 3.0, 4) AS quality
FROM s
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (north-star text analysis): pure scan-speed surface
    statistics, no Python."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(quality_score("text"), 4).alias("quality"))


@query(
    "doc_language_id",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(
                     regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') END AS toks
  FROM documents),
h AS (
  SELECT doc_id,
    len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that'], lower(x)))) AS en,
    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], lower(x)))) AS de,
    len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','des'], lower(x)))) AS fr,
    len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un','una','que'], lower(x)))) AS es,
    len(list_filter(toks, x -> list_contains(['và','là','của','không','có','một','những','được'], lower(x)))) AS vi
  FROM t)
SELECT doc_id,
       CASE WHEN greatest(en, de, fr, es, vi) = 0 THEN 'und'
            WHEN en >= de AND en >= fr AND en >= es AND en >= vi THEN 'en'
            WHEN de >= fr AND de >= es AND de >= vi THEN 'de'
            WHEN fr >= es AND fr >= vi THEN 'fr'
            WHEN es >= vi THEN 'es'
            ELSE 'vi' END AS lang_pred
FROM h
""",
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID (north-star): argmax over per-language
    stopword hits, earlier language wins ties."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", language_id("text").alias("lang_pred"))


# ---------------------------------------------------------------------------
# embeddings: similarity search (north-star)
# ---------------------------------------------------------------------------


@query(
    "embedding_knn_top3",
    oracle="""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
           AS sim
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, rnk FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM sims) t
WHERE rnk <= 3
""",
)
def embedding_knn_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (north-star similarity search baseline):
    broadcast the (small) query set against the corpus — the corpus side
    streams with no shuffle; top-k via rank window on (query, sim).

    Dot products run JVM-side via zip_with + aggregate in DOUBLE, iterating
    in array order so the oracle's summation matches bit-for-bit; only the
    (query_id, neighbor_id, rank) triple is returned so ulp-level float
    noise cannot touch the hash."""
    e = _t(spark, sf_dir, "embeddings", spread=True)
    vec = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", vec.alias("v"))
    q = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sims = (
        F.broadcast(q)
        .crossJoin(base.withColumnRenamed("vec_id", "neighbor_id"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("qv"), F.col("v"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("v"), F.col("v")))
                )
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "rnk")
    )


@query(
    "nation_foreign_regions",
    oracle="""
SELECT n_name, count(*) AS n_foreign_regions
FROM nation JOIN region ON n_regionkey <> r_regionkey
GROUP BY n_name
""",
)
def nation_foreign_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join (no equi conjunct) -> broadcast nested-loop join;
    legitimate only for tiny dims like this, and the plan proves the engine
    picks BNLJ + broadcast rather than a cartesian shuffle."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey != r.r_regionkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_foreign_regions"))
    )


@query(
    "salted_priority_counts",
    oracle="""
SELECT o_orderpriority,
       count(*)                         AS n_orders,
       round(sum(o_totalprice), 2)      AS total
FROM orders
GROUP BY o_orderpriority
""",
)
def salted_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (skew mitigation): o_orderpriority has
    only 5 hot values — exactly the shape where a single-phase groupBy puts
    each key on one reducer. The salted plan must produce identical results
    to the plain GROUP BY oracle."""
    from ..operators.skew import salted_agg

    o = _t(spark, sf_dir, "orders")
    out = salted_agg(
        o,
        ["o_orderpriority"],
        [
            (F.count(F.lit(1)), F.sum, "n_orders"),
            (F.sum("o_totalprice"), F.sum, "total_raw"),
        ],
    )
    return out.select(
        "o_orderpriority", "n_orders", F.round("total_raw", 2).alias("total")
    )


@query("approx_distinct_parts")  # rows-only: HLL sketch values are engine-specific
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per return flag — the
    approximate-aggregate surface; exact distinct is covered by
    priority_distinct_customers."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "returnflag_metrics_unpivot",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2)      AS total_qty,
         round(sum(l_extendedprice), 2) AS total_price
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, 'total_qty' AS metric, total_qty AS value FROM m
UNION ALL
SELECT l_returnflag, 'total_price' AS metric, total_price AS value FROM m
""",
)
def returnflag_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (§2.7 family): wide per-flag metrics -> long
    (flag, metric, value) via stack()."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'total_qty', total_qty, 'total_price', total_price) AS (metric, value)",
    )


@query(
    "events_json_key_counts",
    oracle="""
WITH k AS (SELECT unnest(json_keys(props)) AS key FROM events)
SELECT key, count(*) AS n FROM k GROUP BY key
""",
)
def events_json_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse the JSON props into map<string,int>,
    explode its keys, count occurrences."""
    e = _t(spark, sf_dir, "events")
    keys = F.map_keys(F.from_json("props", "map<string,int>"))
    return (
        e.select(F.explode(keys).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_click_purchase_pairs",
    oracle="""
SELECT a.user_id,
       a.event_id AS first_event,
       b.event_id AS then_event
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND a.event_type = 'click'
 AND b.event_type = 'purchase'
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 30 MINUTE
""",
)
def events_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.events.correlate_event_pairs (§2.10
    stream-stream range join): click -> purchase by the same user within 30
    minutes. Runs THROUGH the streaming operator (watermarks are no-ops on a
    batch frame), so the join condition the oracle checks is byte-identical
    to the one the stream executes."""
    from ..streaming.events import correlate_event_pairs

    e = _t(spark, sf_dir, "events")
    return correlate_event_pairs(e, "click", "purchase", "30 minutes")


@query(
    "lineitem_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization cube/rollup specialize):
    per-(flag,status), per-flag, and grand-total rows from ONE aggregation
    pass — Catalyst expands the sets via a single Expand node feeding one
    hash aggregate, so the input is scanned once regardless of how many
    sets are requested."""
    li = _t(spark, sf_dir, "lineitem")
    # unique view name: clobbering a user's own `lineitem` temp view as a
    # plan-construction side effect would silently change their queries
    li.createOrReplaceTempView("vlds_lineitem_gsets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM vlds_lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "forecast_revenue_q6",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global agg — the canonical predicate-pushdown
    benchmark. All four predicates reach the parquet scan (min/max row-group
    skipping does the heavy lifting at 100 TB); the aggregation is a single
    partial+final sum with no grouping key, so the shuffle is one row per
    partition."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


@query(
    "promo_revenue_q14",
    oracle="""
SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast-joined dim
    (part is ~2% of lineitem — the month filter prunes lineitem down before
    the join, and both sums share one aggregation pass)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "purchase_click_attribution",
    oracle="""
WITH clicks AS (SELECT user_id, ts, min(event_id) AS click_id
                FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_micros
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase matched to the same
    user's latest click at or before it — last-touch attribution. Clicks are
    canonicalized to one per (user, instant) first so ties are deterministic
    on both engines. The union+window formulation costs one shuffle on
    user_id; the DuckDB oracle uses its native ASOF LEFT JOIN, an
    independent implementation of the same semantics."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = asof_join(purchases, clicks, on="user_id", right_cols=("click_id",))
    return out.select(
        "event_id",
        "user_id",
        F.col("click_id_right").alias("click_id"),
        # ts is NTZ; the session tz is pinned UTC (ensure_semantic_confs),
        # so the LTZ cast is identity and unix_micros == DuckDB epoch_us
        (
            F.unix_micros(F.col("ts").cast("timestamp_ltz"))
            - F.unix_micros(F.col("ts_right").cast("timestamp_ltz"))
        ).alias("gap_micros"),
    )


@query(
    "scalar_function_showcase",
    oracle="""
SELECT printf('order-%d-%s', o_orderkey, lower(o_orderstatus)) AS tag,
       strftime(o_orderdate, '%Y-%m-%d')                       AS order_day,
       upper(substring(o_orderpriority, 3, 6))                 AS prio,
       length(o_orderpriority)                                 AS prio_len
FROM orders
""",
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (C8 templating, C13 timestamp formatting,
    case/substring/length): prompt-template shapes as format_string, date
    rendering as date_format."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.format_string("order-%d-%s", "o_orderkey", F.lower("o_orderstatus")).alias("tag"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.upper(F.substring("o_orderpriority", 3, 6)).alias("prio"),
        F.length("o_orderpriority").alias("prio_len"),
    )


@query(
    "monthly_order_volume",
    oracle="""
SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1
""",
)
def monthly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup (C13 date handling): date_trunc to month, epoch key."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias("month_start"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "customer_order_full_outer",
    oracle="""
SELECT coalesce(c_custkey, o_custkey)     AS custkey,
       coalesce(c_name, '<no-customer>')  AS name,
       coalesce(n_orders, 0)              AS n_orders
FROM customer
FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
                 FROM orders GROUP BY o_custkey) o
  ON c_custkey = o_custkey
""",
)
def customer_order_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null-side coalescing — the union of F1+F2's
    keep/report sides in one plan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.coalesce("c_name", F.lit("<no-customer>")).alias("name"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@query(
    "customer_balance_ranks",
    oracle="""
SELECT c_mktsegment, c_custkey,
       dense_rank() OVER w AS drank,
       ntile(4)     OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + ntile windows (O3/O4 family) with explicit tiebreak."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "customer_first_last_order",
    oracle="""
SELECT DISTINCT o_custkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)  OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with full-partition frame (O4)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).distinct()


@query(
    "source_name_sanitize",
    oracle="""
SELECT DISTINCT source,
       translate(source, ':.', '__')                      AS sanitized,
       regexp_extract('/data/' || source || '/doc_' || source || '.txt',
                      '([^/]+)\\.[^./]+$', 1)             AS stem
FROM documents
""",
)
def source_name_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-name sanitize (C6) + filename-stem extraction (C7) as scan-level
    string expressions."""
    from ..functions.text import filename_stem, sanitize_model_name

    d = _t(spark, sf_dir, "documents")
    path = F.concat(F.lit("/data/"), F.col("source"), F.lit("/doc_"), F.col("source"), F.lit(".txt"))
    return d.select(
        "source",
        sanitize_model_name("source").alias("sanitized"),
        filename_stem(path).alias("stem"),
    ).distinct()


@query(
    "segment_price_percentiles",
    oracle="""
SELECT c_mktsegment,
       round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
       count(*)                                    AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def segment_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per segment — Spark ``percentile`` and
    DuckDB ``quantile_cont`` share continuous-interpolation semantics."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "returnflag_except_all",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
""",
)
def returnflag_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (exceptAll keeps duplicate cardinalities, unlike
    the set-semantics EXCEPT in part_heavy_only)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_partkey")
        .exceptAll(li.filter(F.col("l_returnflag") == "A").select("l_partkey"))
    )


@query(
    "estimated_chunk_counts",
    oracle=f"""
SELECT lang,
       CAST(sum(greatest(1, CAST(floor(len({_DUCK_TOKS}) / 100.0) AS BIGINT))) AS BIGINT)
         AS est_chunks,
       count(*) AS n_docs
FROM documents
GROUP BY lang
""",
)
def estimated_chunk_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated chunk count per corpus slice (A8, run_full_evaluation_
    pipeline.py:280-285): max(1, tokens // chunk_size) summed."""
    d = _t(spark, sf_dir, "documents")
    est = F.greatest(F.lit(1).cast("long"), F.floor(ws_token_count("text") / 100))
    return d.groupBy("lang").agg(
        F.sum(est).alias("est_chunks"), F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# dedup & ANN (north-star training-data-pipeline operators)
# ---------------------------------------------------------------------------


@query(
    "ngram_jaccard_top20",
    oracle=f"""
WITH t AS (SELECT doc_id,
                  list_transform({_DUCK_TOKS}, x -> lower(x)) AS toks
           FROM documents),
sh AS (SELECT doc_id,
              list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shs
       FROM t WHERE len(toks) >= 3),
e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
rare AS (SELECT sh FROM e GROUP BY sh HAVING count(*) <= 64),
e2 AS (SELECT e.doc_id, e.sh FROM e JOIN rare USING (sh)),
pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM e2 a JOIN e2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id1, id2,
       round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id1
JOIN sizes sb ON sb.doc_id = id2
ORDER BY jaccard DESC, id1, id2
LIMIT 20
""",
)
def ngram_jaccard_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (north-star dedup): inverted-index
    self-join on distinct shingles — |A n B| from posting lists, top 20 pairs
    with deterministic (jaccard, id1, id2) ordering. Stop-shingles (doc freq
    > 64) are dropped before the self-join (the posting-list quadratic-blowup
    guard); the oracle applies the identical cap."""
    from ..operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return ngram_jaccard_pairs(d, top_k=20, max_doc_freq=64)


@query("minhash_lsh_dedup")  # rows-only: xxhash64 family is Spark-specific
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands) near-dup candidate pairs at est-Jaccard
    >= 0.5. Signatures are per-row JVM HOFs (no explode/shuffle); the band
    bucket join is the only shuffle. Verified in tests against planted
    near-duplicates; hash family prevents a cross-engine oracle."""
    from ..operators.dedup import minhash_dedup_pairs

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return minhash_dedup_pairs(d, threshold=0.5)


@query("simhash_near_dups")  # rows-only: xxhash64-derived bit signatures
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs within hamming distance 8, banded into
    4x16-bit keys for the candidate join."""
    from ..operators.dedup import simhash_near_dup_pairs

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return simhash_near_dup_pairs(d, max_hamming=8)


@query(
    "minhash_md5_dedup",
    oracle=f"""
WITH t AS (SELECT doc_id, list_transform({_DUCK_TOKS}, x -> lower(x)) AS toks
           FROM documents),
e AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
    FROM t WHERE len(toks) >= 3),
hi AS (SELECT doc_id, i,
              min(('0x' || substring(md5(i::VARCHAR || ':' || sh), 1, 15))::BIGINT) AS h
       FROM e, unnest(range(16)) AS u(i)
       GROUP BY doc_id, i),
sigs AS MATERIALIZED (SELECT doc_id, list(h ORDER BY i) AS sig FROM hi GROUP BY doc_id),
bands AS MATERIALIZED (
    SELECT doc_id, b, sig[b*4+1:b*4+4]::VARCHAR AS bk
    FROM sigs, unnest(range(4)) AS u(b)),
cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
         FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id),
paired AS (SELECT id1, id2,
                  len(list_filter(range(1, 17), i -> s1.sig[i] = s2.sig[i])) / 16.0 AS est
           FROM cand
           JOIN sigs s1 ON s1.doc_id = cand.id1
           JOIN sigs s2 ON s2.doc_id = cand.id2)
SELECT id1, id2, round(est, 6) AS est_jaccard
FROM paired WHERE est >= 0.5
""",
)
def minhash_md5_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands) near-dup pairs on the md5 hash family —
    the cross-engine verification twin of ``minhash_lsh_dedup``: signatures,
    banding, candidate join, and agreement fraction are all replicated
    bit-for-bit by the DuckDB oracle (md5 exists in both engines; xxhash64
    is Spark-only). Shares the band-join/agreement plan with the production
    path via ``minhash_lsh_candidates``."""
    from ..operators.dedup import minhash_md5_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_md5_pairs(d, threshold=0.5)


# CTE list reproducing the md5-32 SimHash near-dup PAIRS (shared by the
# pair query below and the connected-components closure in plans/clusters.py)
_SIMHASH_MD5_PAIR_CTES = f"""
t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
e AS MATERIALIZED (
    SELECT doc_id, ('0x' || substring(md5(tok), 1, 8))::BIGINT AS h
    FROM t, unnest(toks) AS u(tok)),
votes AS (SELECT doc_id, b,
                 CAST(sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
          FROM e, unnest(range(32)) AS ub(b)
          GROUP BY doc_id, b),
sigs AS MATERIALIZED (
    SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
    FROM votes GROUP BY doc_id),
bands AS MATERIALIZED (
    SELECT doc_id, sig, b, (sig >> (b * 8)) & 255 AS bk
    FROM sigs, unnest(range(4)) AS u(b)),
cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2, a.sig AS s1, c.sig AS s2
         FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id),
simpairs AS (SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
             FROM cand WHERE bit_count(xor(s1, s2)) <= 6)"""


@query(
    "simhash_md5_near_dups",
    oracle=f"""
WITH {_SIMHASH_MD5_PAIR_CTES}
SELECT id1, id2, hamming FROM simpairs
""",
)
def simhash_md5_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash near-dup pairs (hamming <= 6, 4x8-bit bands) on the
    md5-32 hash family — the oracle-checkable twin of ``simhash_near_dups``:
    the DuckDB oracle reproduces the bit-vote signatures, banding, and
    hamming verify exactly."""
    from ..operators.dedup import md5_hash32, simhash_near_dup_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = simhash_near_dup_pairs(d, max_hamming=6, bits=32, hash_col_fn=md5_hash32)
    sel = out.select("id1", "id2", F.col("hamming").cast("int").alias("hamming"))
    # carry the unpersist hook across the select (the minhash twins'
    # pattern): losing it makes operators.unpersist_inputs a silent no-op
    # and leaks the cached signatures in long-lived sessions
    sel._persisted_inputs = getattr(out, "_persisted_inputs", [])
    return sel


@query(
    "embedding_cosine_pairs_exact",
    oracle="""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 300)
SELECT a.vec_id AS id1, b.vec_id AS id2
FROM v a, v b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.3
""",
)
def embedding_cosine_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact brute force on a bounded subset
    (the verify stage of the dedup family): all-pairs cosine >= threshold,
    ids only so float noise can't touch the hash."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    vec = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", vec.alias("v"))
    a = base.alias("a")
    b = base.alias("b")
    from ..metrics.semantic import cosine_similarity_expr

    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id1"),
        F.col("b.vec_id").alias("id2"),
        cosine_similarity_expr(F.col("a.v"), F.col("b.v")).alias("_cos"),
    )
    return pairs.filter(F.col("_cos") >= 0.3).select("id1", "id2")


@query(
    "doc_winnow_fingerprints",
    oracle="""
WITH t AS (
  SELECT doc_id,
         lower(regexp_replace(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                              '\\s+', ' ', 'g')) AS s
  FROM documents),
g AS MATERIALIZED (
  SELECT doc_id, len(s) AS n, i,
         ('0x' || substring(md5(substring(s, i + 1, 8)), 1, 15))::BIGINT AS h
  FROM t, unnest(range(len(s) - 7)) AS u(i)
  WHERE len(s) >= 8),
m AS (
  SELECT doc_id, i, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM g)
SELECT DISTINCT doc_id, fp AS fingerprint
FROM m WHERE i <= greatest(n - 11, 0)
""",
)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (k=8 char-grams, window w=4) over
    the corpus — MOSS-style local fingerprinting next to the whole-doc
    exact-dedup hash. md5-based gram hashing, so the DuckDB oracle replays
    gram hashing, window-min selection, and the short-doc clamp exactly."""
    from ..operators.dedup import winnowing_fingerprints

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return winnowing_fingerprints(d, k=8, w=4, gram_hash="md5")


@query(
    "doc_span_dedup",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             greatest(1, CAST(ceil(len(toks) / 20.0) AS INT)) AS nc
      FROM t),
x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM n),
sp AS (SELECT doc_id, CAST(i AS INT) AS idx,
              array_to_string(toks[i*20+1 : (i+1)*20], ' ') AS s
       FROM x),
k AS (SELECT doc_id, idx, s,
             row_number() OVER (PARTITION BY s ORDER BY doc_id, idx) AS rn
      FROM sp)
SELECT doc_id,
       coalesce(string_agg(s, ' ' ORDER BY idx) FILTER (WHERE rn = 1), '') AS text,
       count(*) AS n_spans,
       count(*) FILTER (WHERE rn > 1) AS n_removed
FROM k GROUP BY doc_id
""",
)
def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact span dedup (operators/dedup.py:span_dedup — the
    C4/RefinedWeb repeated-paragraph pass on 20-token windows): repeated
    spans keep only their globally-first occurrence; documents are
    reassembled from survivors with removal counts. dedup_key='text' here
    so the DuckDB oracle replays chunking, keep-first ranking, and
    reassembly exactly (the xxhash64 key is the production default)."""
    from ..operators.dedup import span_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return span_dedup(d, span_tokens=20, dedup_key="text")


def _pii_oracle_sql() -> str:
    """Compose the PII oracle from the SAME patterns the operator uses
    (functions/pii.py) — .format, not f-string, because the regexes contain
    braces. DuckDB needs the 'g' flag (Spark replaces all by default)."""
    from ..functions.pii import PII_PATTERNS

    dec = (
        "coalesce(text, '') || ' contact user' || doc_id::VARCHAR"
        " || '@example.com node 10.' || (doc_id % 200)::VARCHAR || '.0.'"
        " || (doc_id % 250)::VARCHAR || ' call +84-555-'"
        " || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    )
    # counts replay pii_counts' SEQUENTIAL semantics: each kind is counted
    # on the text with all earlier kinds already redacted, so counts match
    # the tags the redaction emits (no double-counting nested matches)
    return """
WITH d AS (SELECT doc_id, {dec} AS s FROM documents),
     seq AS (SELECT doc_id, s,
                    regexp_replace(s, '{email}', '[EMAIL]', 'g') AS s1,
                    regexp_replace(regexp_replace(s,
                      '{email}', '[EMAIL]', 'g'),
                      '{phone}', '[PHONE]', 'g') AS s2
             FROM d)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{email}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(s1, '{phone}')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(s2, '{ipv4}')) AS INT) AS n_ipv4,
       regexp_replace(s2, '{ipv4}', '[IP]', 'g') AS redacted
FROM seq
""".format(
        dec=dec,
        email=PII_PATTERNS["email"],
        phone=PII_PATTERNS["phone"],
        ipv4=PII_PATTERNS["ipv4"],
    )


@query("doc_pii_redact", oracle=_pii_oracle_sql())
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene pass (functions/pii.py): per-doc match counts + typed
    redaction ([EMAIL]/[PHONE]/[IP]). The corpus is word salad with no real
    PII, so each doc is decorated with a deterministic fake email/IP/phone
    derived from its id — the redacted TEXT is the hash-checked value, so
    the row pins pattern semantics across both engines (RE2-compatible
    patterns; DuckDB replays them verbatim with the 'g' flag). Pure
    regexp expressions: scan-speed, codegen, zero shuffle. Round-10 plan
    audit: routed through ``redact_pii_with_counts`` so the shared replace
    chain is staged in its own projections (each regex pass exactly once
    per row by construction, not by codegen CSE)."""
    from ..functions.pii import redact_pii_with_counts

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    decorated = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com node 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call +84-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return redact_pii_with_counts(
        d.select("doc_id", decorated.alias("text")), "text"
    )


@query("doc_winnow_fast")  # rows-only: xxhash64 has no DuckDB twin
def doc_winnow_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash winnowing twin: identical selection logic to
    doc_winnow_fingerprints but xxhash64 gram hashing (one JVM hash per
    gram vs md5's digest+hex+parse chain — ~2x cheaper, the default for
    non-harness callers). No SQL oracle exists for xxhash64, so this row is
    rows-only; selection-logic correctness rides on the md5 twin's green
    oracle (identical code path modulo the hash expression) plus the
    hash-agnostic property tests (shared-substring guarantee, zero-shuffle
    plan, normalization) in tests/test_dedup_similarity.py."""
    from ..operators.dedup import winnowing_fingerprints

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return winnowing_fingerprints(d, k=8, w=4)


def _srp_planes_values_sql(dim: int = 64, n_planes: int = 8, seed: int = 42) -> str:
    """The seeded SRP hyperplanes as a DuckDB VALUES list — the SAME literal
    doubles Spark's ``srp_signature_expr`` embeds in its plan (numpy
    ``default_rng(seed)``; ``repr(float)`` round-trips IEEE doubles), so the
    oracle reproduces bucket assignment bit-for-bit."""
    from ..operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)
    return ", ".join(
        f"({p}, [{', '.join(repr(float(x)) for x in row)}]::DOUBLE[])"
        for p, row in enumerate(planes)
    )


@query(
    "embedding_near_dups_lsh",
    oracle=f"""
WITH planes AS (SELECT * FROM (VALUES {_srp_planes_values_sql()}) p(pid, w)),
base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS MATERIALIZED (
  SELECT vec_id,
         CAST(sum(CASE WHEN list_dot_product(v, w) > 0
                       THEN (1::BIGINT << pid) ELSE 0 END) AS BIGINT) AS sig
  FROM base, planes GROUP BY vec_id),
probes AS (
  SELECT vec_id,
         unnest(list_concat([sig],
                list_transform(range(8), p -> xor(sig, 1::BIGINT << p)))) AS bucket
  FROM sigs),
cand AS (
  SELECT DISTINCT l.vec_id AS id1, r.vec_id AS id2
  FROM probes l JOIN sigs r ON r.sig = l.bucket AND l.vec_id < r.vec_id)
SELECT id1, id2
FROM cand
JOIN base b1 ON b1.vec_id = id1
JOIN base b2 ON b2.vec_id = id2
WHERE list_dot_product(b1.v, b2.v)
        / (sqrt(list_dot_product(b1.v, b1.v)) * sqrt(list_dot_product(b2.v, b2.v)))
      >= 0.35
""",
)
def embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-banded embedding near-dup pairs with exact-cosine verify — the
    scale path whose candidate set is ~1/2^planes of the quadratic space.

    Oracle-checked: the seeded hyperplanes make bucketing deterministic, so
    the DuckDB oracle replays banding, multi-probe, and the exact-cosine
    verify (summation-order parity per embedding_knn_top3)."""
    from ..operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    out = embedding_near_dup_pairs(e, dim=64, threshold=0.35, n_planes=8)
    return out.select("id1", "id2")


def _ivf_centroids_values_sql(dim: int = 64, n_lists: int = 8, seed: int = 7) -> str:
    from ..operators.similarity import ivf_fixed_centroids

    return ", ".join(
        f"({ci}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for ci, c in enumerate(ivf_fixed_centroids(dim, n_lists, seed))
    )


@query(
    "embedding_ivf_fixed_top3",
    oracle=f"""
WITH cents AS (SELECT * FROM (VALUES {_ivf_centroids_values_sql()}) c(cid, w)),
base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dists AS MATERIALIZED (
  SELECT vec_id, cid,
         list_sum(list_transform(range(64), i -> (v[i+1] - w[i+1]) ** 2)) AS d
  FROM base, cents),
assign AS MATERIALIZED (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM dists) t WHERE rn = 1),
qprob AS (
  SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM dists WHERE vec_id < 10) t WHERE rn <= 2),
cand AS (
  SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
  FROM qprob q JOIN assign a ON a.cell = q.cell
  WHERE a.vec_id <> q.query_id),
sims AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(bq.v, bn.v)
           / (sqrt(list_dot_product(bq.v, bq.v))
              * sqrt(list_dot_product(bn.v, bn.v))) AS sim
  FROM cand c
  JOIN base bq ON bq.vec_id = c.query_id
  JOIN base bn ON bn.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM sims) t
WHERE rnk <= 3
""",
)
def embedding_ivf_fixed_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with seeded FIXED centroids — the oracle-checkable twin of
    embedding_ivf_top3: same assignment/pruning/rerank machinery
    (ivf_assign + ivf_topk), but the coarse quantizer is a seeded literal
    the DuckDB oracle replays (k-means' iterative fit isn't SQL-replayable;
    its search path is)."""
    from ..operators.similarity import ivf_assign, ivf_fixed_centroids, ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    cents = ivf_fixed_centroids(dim=64, n_lists=8)
    assigned = ivf_assign(e, cents)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = ivf_topk(q, assigned, cents, k=3, n_probe=2)
    return out.select("query_id", "neighbor_id", "rnk")


@query("embedding_ivf_top3")  # rows-only: k-means cells are iterative/seeded
def embedding_ivf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: k-means cells + n_probe search + exact
    rerank — the named north-star IVF variant next to the SRP-LSH one."""
    from ..operators.similarity import ivf_build_index, ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build_index(e, n_lists=8)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ivf_topk(q, assigned, centroids, k=3, n_probe=2).select(
        "query_id", "neighbor_id", "rnk"
    )


@query(
    "embedding_ann_lsh_top3",
    oracle=f"""
WITH planes AS (SELECT * FROM (VALUES {_srp_planes_values_sql()}) p(pid, w)),
base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS MATERIALIZED (
  SELECT vec_id,
         CAST(sum(CASE WHEN list_dot_product(v, w) > 0
                       THEN (1::BIGINT << pid) ELSE 0 END) AS BIGINT) AS sig
  FROM base, planes GROUP BY vec_id),
probes AS (
  SELECT vec_id AS query_id,
         unnest(list_concat([sig],
                list_transform(range(8), p -> xor(sig, 1::BIGINT << p)))) AS bucket
  FROM sigs WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT probes.query_id, s.vec_id AS neighbor_id
  FROM probes JOIN sigs s ON s.sig = probes.bucket
  WHERE s.vec_id <> probes.query_id),
sims AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(bq.v, bn.v)
           / (sqrt(list_dot_product(bq.v, bq.v))
              * sqrt(list_dot_product(bn.v, bn.v))) AS sim
  FROM cand c
  JOIN base bq ON bq.vec_id = c.query_id
  JOIN base bn ON bn.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM sims) t
WHERE rnk <= 3
""",
)
def embedding_ann_lsh_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (the scale path next to embedding_knn_top3's
    exact baseline): SRP bucket join + multi-probe + exact rerank.

    Fully oracle-checked despite 'approximate': the hyperplanes are seeded
    literals, so bucketing — and therefore the exact candidate set — is
    deterministic and the DuckDB oracle replays signature, multi-probe,
    and rerank bit-for-bit (only rank ints are output; see
    embedding_knn_top3 on summation-order parity)."""
    from ..operators.similarity import random_hyperplane_lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = random_hyperplane_lsh_topk(q, e, dim=64, k=3, n_planes=8)
    return out.select("query_id", "neighbor_id", "rnk")


@query(
    "ann_recall_at3",
    # composed from the three already-oracled ANN queries: exact KNN is the
    # ground truth, SRP-LSH and fixed-centroid IVF are the approximate paths
    oracle=f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({ORACLES["embedding_knn_top3"]}) t),
lsh AS (SELECT query_id, neighbor_id FROM ({ORACLES["embedding_ann_lsh_top3"]}) t),
ivf AS (SELECT query_id, neighbor_id FROM ({ORACLES["embedding_ivf_fixed_top3"]}) t)
SELECT e.query_id,
       count(l.neighbor_id) AS lsh_hits,
       round(count(l.neighbor_id) / 3.0, 6) AS lsh_recall_at3,
       count(i.neighbor_id) AS ivf_hits,
       round(count(i.neighbor_id) / 3.0, 6) AS ivf_recall_at3
FROM exact e
LEFT JOIN lsh l ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
LEFT JOIN ivf i ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
""",
)
def ann_recall_at3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall@3 measured INSIDE the harness (round-2 gap: driver entries
    for the approximate paths checked shape, not quality): join each
    approximate method's top-3 against the exact brute-force top-3 and emit
    per-query hit counts + recall for both SRP-LSH (multi-probe) and
    fixed-centroid IVF (n_probe=2).

    Every side is deterministic (seeded planes/centroids), so the whole
    recall computation — candidate sets included — replays in the DuckDB
    oracle. The final joins touch 30 rows a side; cost lives in the three
    upstream ANN plans, each individually driver-green.

    The three subplans share no data, but materialized by one driver
    thread their AQE stage chains run end-to-end sequentially (measured:
    whole = knn + lsh + ivf, ~zero overlap). ``checkpoint_concurrently``
    materializes each top-3 set (≤30 rows) from its own driver thread so
    the chains overlap (guide §2.6) — measured 5.98s -> 3.65s at sf0.1
    with bit-identical output (OPTIMIZATION_r13.md); re-confirmed r14 on
    the driver's protocol, threaded wins 6/6 reps, -15%
    (plans/r14/probe_ann_threaded.json).

    Lifecycle note (same contract as ``connected_components``): each call
    pins THREE tiny (≤30-row) localCheckpoint RDDs for the session — plan
    construction runs three Spark jobs up front, and the returned plan
    reads the checkpoints. A long-lived session making many calls can
    reclaim them with ``operators._ckpt.release_rdds`` over a before/after
    ``persistent_rdd_ids`` snapshot once its derived results are
    materialized; the bench's blanket release does exactly that."""
    from ..operators._ckpt import checkpoint_concurrently

    exact, lsh, ivf = checkpoint_concurrently(
        [
            embedding_knn_top3(spark, sf_dir).select("query_id", "neighbor_id"),
            embedding_ann_lsh_top3(spark, sf_dir).select("query_id", "neighbor_id"),
            embedding_ivf_fixed_top3(spark, sf_dir).select("query_id", "neighbor_id"),
        ]
    )
    lsh = lsh.select("query_id", "neighbor_id", F.lit(1).alias("_lsh"))
    ivf = ivf.select("query_id", "neighbor_id", F.lit(1).alias("_ivf"))
    keys = ["query_id", "neighbor_id"]
    return (
        exact.join(lsh, keys, "left")
        .join(ivf, keys, "left")
        .groupBy("query_id")
        .agg(
            F.count("_lsh").alias("lsh_hits"),
            F.round(F.count("_lsh") / 3.0, 6).alias("lsh_recall_at3"),
            F.count("_ivf").alias("ivf_hits"),
            F.round(F.count("_ivf") / 3.0, 6).alias("ivf_recall_at3"),
        )
    )


@query(
    "multimodal_decode_features",
    oracle="""
WITH h AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents)
SELECT doc_id AS media_id,
       64 + ('0x' || substring(hx, 1, 2))::INT % 192 AS width,
       64 + ('0x' || substring(hx, 3, 2))::INT % 192 AS height,
       array_to_string(
         list_transform(range(8),
           i -> CAST(round(('0x' || substring(hx, 5 + 2 * i, 2))::INT
                           * 1000000.0 / 255.0) AS BIGINT)::VARCHAR),
         ',') AS features_sig
FROM h
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end (north-star): lift the corpus into
    binary media rows, decode + feature-extract via mapInPandas (deterministic
    fake codec) — the full (media_id, width, height, features) path of
    ``decode_media``.

    The library API keeps ``features`` as ``array<float>``; the REGISTERED
    query projects it to a micro-unit string signature
    (``round(x * 1e6)`` per component, comma-joined) because the driver's
    canonicalizer sorts output columns with pandas and cannot hash list
    cells (the r02 ``unhashable type: 'list'`` crash). The fake codec's
    features are ``round(byte/255, 6)`` floats, so byte ``b`` maps exactly
    to integer ``round(b * 1e6 / 255)`` — no tie sits near a float32 ulp
    (the nearest half-integer is >= 1/102 away at the 1e6 scale), and the
    DuckDB oracle replays the sha256-derived bytes bit-for-bit."""
    from ..operators.multimodal import attach_fake_media, decode_media

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = decode_media(attach_fake_media(d))
    return out.select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.concat_ws(
            ",",
            F.transform(
                "features",
                lambda x: F.round(x.cast("double") * 1e6).cast("long").cast("string"),
            ),
        ).alias("features_sig"),
    )


@query(
    "multimodal_decode_dims",
    oracle="""
SELECT doc_id AS media_id,
       64 + ('0x' || substring(sha256(coalesce(text, '')), 1, 2))::INT % 192 AS width,
       64 + ('0x' || substring(sha256(coalesce(text, '')), 3, 2))::INT % 192 AS height
FROM documents
""",
)
def multimodal_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the multimodal decode path: the deterministic
    fake codec derives dimensions from the sha256 content digest
    (byte0/byte1 -> width/height), which DuckDB reproduces from the same
    UTF-8 bytes — pinning attach_fake_media's binary lift + decode_media's
    Arrow-batched mapInPandas end-to-end with scalar outputs (the float32
    feature vector stays in the rows-only twin above: cross-engine
    float32-vs-double array hashing is not stable)."""
    from ..operators.multimodal import attach_fake_media, decode_media

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_media(attach_fake_media(d)).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    )


# ---------------------------------------------------------------------------
# metric engine (§2.9 M1-M5, §2.5 A2/A4/A5) on the documents corpus
# ---------------------------------------------------------------------------

# shared oracle CTE: a synthetic (generated, reference) pair per doc —
# generated = tokens 1..60, reference = tokens 31..120 (guaranteed overlap)
_DUCK_ROUGE1 = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
pair AS (SELECT doc_id, toks[1:60] AS g, toks[31:120] AS r FROM t),
gc AS (SELECT doc_id, tok, count(*) AS c
       FROM (SELECT doc_id, unnest(g) AS tok FROM pair) GROUP BY 1, 2),
rc AS (SELECT doc_id, tok, count(*) AS c
       FROM (SELECT doc_id, unnest(r) AS tok FROM pair) GROUP BY 1, 2),
i AS (SELECT gc.doc_id, sum(least(gc.c, rc.c)) AS inter
      FROM gc JOIN rc ON gc.doc_id = rc.doc_id AND gc.tok = rc.tok GROUP BY 1),
l AS (SELECT pair.doc_id, len(g) AS lg, len(r) AS lr, coalesce(inter, 0) AS inter
      FROM pair LEFT JOIN i ON pair.doc_id = i.doc_id),
scores AS (
  SELECT doc_id,
         CASE WHEN lg > 0 AND lr > 0 AND inter > 0
              THEN 2.0 * inter / (lg + lr) ELSE 0.0 END AS rouge1
  FROM l)
"""


def _rouge1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle CTE, scored with the vectorized explode-join
    path (rouge1_f1_df); the shuffle-free expression variant is
    metrics.rouge.rouge1_f1_expr, equivalence-tested in tests/test_metrics."""
    from ..metrics.rouge import rouge1_f1_df

    d = _t(spark, sf_dir, "documents")
    toks = tokenize_ws("text")
    pair = d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 60), " ").alias("g"),
        F.array_join(F.slice(toks, 31, 90), " ").alias("r"),
    )
    return rouge1_f1_df(pair)


@query(
    "rouge1_per_doc",
    oracle=_DUCK_ROUGE1
    + """
SELECT doc_id, round(rouge1, 6) AS rouge1_f FROM scores
""",
)
def rouge1_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 F1 per (generated, reference) pair (M1) — multiset unigram
    overlap computed entirely JVM-side (metrics.rouge.rouge1_f1_expr)."""
    out = _rouge1_pairs(spark, sf_dir)
    sel = out.select("doc_id", F.round("rouge1", 6).alias("rouge1_f"))
    sel._persisted_inputs = getattr(out, "_persisted_inputs", [])
    return sel


@query(
    "rouge2_per_doc",
    oracle=f"""
WITH t AS (SELECT doc_id, list_transform({_DUCK_TOKS}, x -> x) AS toks FROM documents),
pair AS (SELECT doc_id, toks[1:60] AS g, toks[31:120] AS r FROM t),
gg AS (SELECT doc_id,
              list_transform(range(1, greatest(len(g), 1)),
                             i -> g[i] || ' ' || g[i+1]) AS grams
       FROM pair WHERE len(g) >= 2),
rg AS (SELECT doc_id,
              list_transform(range(1, greatest(len(r), 1)),
                             i -> r[i] || ' ' || r[i+1]) AS grams
       FROM pair WHERE len(r) >= 2),
gc AS (SELECT doc_id, gram, count(*) AS c
       FROM (SELECT doc_id, unnest(grams) AS gram FROM gg) GROUP BY 1, 2),
rc AS (SELECT doc_id, gram, count(*) AS c
       FROM (SELECT doc_id, unnest(grams) AS gram FROM rg) GROUP BY 1, 2),
i AS (SELECT gc.doc_id, sum(least(gc.c, rc.c)) AS inter
      FROM gc JOIN rc ON gc.doc_id = rc.doc_id AND gc.gram = rc.gram GROUP BY 1),
l AS (SELECT pair.doc_id,
             greatest(len(g) - 1, 0) AS lg,
             greatest(len(r) - 1, 0) AS lr,
             coalesce(inter, 0) AS inter
      FROM pair LEFT JOIN i ON pair.doc_id = i.doc_id)
SELECT doc_id,
       round(CASE WHEN lg > 0 AND lr > 0 AND inter > 0
                  THEN 2.0 * inter / (lg + lr) ELSE 0.0 END, 6) AS rouge2_f
FROM l
""",
)
def rouge2_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 F1 per pair (M1's bigram member) via the vectorized n-gram
    explode-join path (rouge_n_f1_df) — bigram multisets, not distinct
    shingles."""
    from ..metrics.rouge import rouge_n_f1_df

    d = _t(spark, sf_dir, "documents")
    toks = tokenize_ws("text")
    pair = d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 60), " ").alias("g"),
        F.array_join(F.slice(toks, 31, 90), " ").alias("r"),
    )
    out = rouge_n_f1_df(pair, 2, out_col="rouge2")
    sel = out.select("doc_id", F.round("rouge2", 6).alias("rouge2_f"))
    sel._persisted_inputs = getattr(out, "_persisted_inputs", [])
    return sel


@query(
    "rouge1_moments_by_lang",
    oracle=_DUCK_ROUGE1
    + """
SELECT lang,
       round(avg(rouge1), 6)        AS mean_r1,
       round(stddev_pop(rouge1), 6) AS std_r1,
       round(min(rouge1), 6)        AS min_r1,
       round(max(rouge1), 6)        AS max_r1,
       count(*)                     AS n
FROM scores JOIN documents USING (doc_id)
GROUP BY lang
""",
)
def rouge1_moments_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric moments (A2): mean/std(pop)/min/max — population std matches
    the reference's numpy default (evaluate_summaries_semantic.py:600-617)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = _rouge1_pairs(spark, sf_dir)
    agg = pairs.join(d, "doc_id").groupBy("lang").agg(
        F.round(F.avg("rouge1"), 6).alias("mean_r1"),
        F.round(F.stddev_pop("rouge1"), 6).alias("std_r1"),
        F.round(F.min("rouge1"), 6).alias("min_r1"),
        F.round(F.max("rouge1"), 6).alias("max_r1"),
        F.count(F.lit(1)).alias("n"),
    )
    agg._persisted_inputs = getattr(pairs, "_persisted_inputs", [])
    return agg


@query(
    "rouge1_histogram",
    oracle=_DUCK_ROUGE1
    + """
SELECT count(*) FILTER (rouge1 >= 0.7)                  AS n_high,
       count(*) FILTER (rouge1 >= 0.4 AND rouge1 < 0.7) AS n_mid,
       count(*) FILTER (rouge1 < 0.4)                   AS n_low
FROM scores
""",
)
def rouge1_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity histogram (A4): the reference's >=0.7 / 0.4-0.7 / <0.4
    bucket counting (evaluate_summaries_semantic.py:661-671)."""
    from ..metrics.aggregate import similarity_histogram

    pairs = _rouge1_pairs(spark, sf_dir)
    hist = similarity_histogram(pairs, "rouge1")
    hist._persisted_inputs = getattr(pairs, "_persisted_inputs", [])
    return hist


@query(
    "best_source_by_quality",
    oracle="""
WITH s AS (
  SELECT lang, source,
         avg((least(1.0, length(text) / 50.0)
              + CASE WHEN (CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                           ELSE len(regexp_split_to_array(
                                  regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END) > 0
                      AND length(regexp_replace(text, '\\s+', '', 'g')) * 1.0
                          / (CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 1
                             ELSE len(regexp_split_to_array(
                                    regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END)
                          BETWEEN 3.0 AND 12.0
                     THEN 1.0 ELSE 0.0 END
              + CASE WHEN length(regexp_replace(text, '\\s+', '', 'g')) > 0
                     THEN length(regexp_replace(regexp_replace(text, '\\s+', '', 'g'),
                                                '[^\\p{L}\\p{N}]', '', 'g')) * 1.0
                          / length(regexp_replace(text, '\\s+', '', 'g'))
                     ELSE 0.0 END) / 3.0) AS avg_quality
  FROM documents GROUP BY lang, source)
SELECT lang, source, round(avg_quality, 6) AS avg_quality FROM (
  SELECT lang, source, avg_quality,
         row_number() OVER (PARTITION BY lang
                            ORDER BY avg_quality DESC, source) AS rn
  FROM s) t
WHERE rn = 1
""",
)
def best_source_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max comparison (A5, run_full_evaluation_pipeline.py:909-921): the
    best-scoring source per language, deterministic rank window."""
    from ..metrics.aggregate import best_by_metric

    d = _t(spark, sf_dir, "documents")
    per_source = d.groupBy("lang", "source").agg(
        F.avg(quality_score("text")).alias("avg_quality")
    )
    best = best_by_metric(per_source, "avg_quality", "source", ["lang"])
    return best.select("lang", "source", F.round("avg_quality", 6).alias("avg_quality"))


@query(
    "llm_judge_mock_scores",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
pair AS (SELECT doc_id, toks[1:60] AS g, toks[31:120] AS r FROM t),
dg AS (SELECT doc_id, unnest(list_distinct(g)) AS tok FROM pair),
dr AS (SELECT doc_id, unnest(list_distinct(r)) AS tok FROM pair),
i AS (SELECT dg.doc_id, count(*) AS c
      FROM dg JOIN dr ON dg.doc_id = dr.doc_id AND dg.tok = dr.tok GROUP BY 1)
SELECT pair.doc_id,
       round(CASE WHEN len(list_distinct(r)) > 0
                  THEN coalesce(c, 0) * 1.0 / len(list_distinct(r))
                  ELSE 0.0 END, 6)            AS llm_correctness,
       round(least(1.0, len(g) / 100.0), 6)   AS llm_coherence,
       'ok'                                   AS status
FROM pair LEFT JOIN i ON pair.doc_id = i.doc_id
""",
)
def llm_judge_mock_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-judge metric path (M4) with the deterministic mock judge: the
    pandas-UDF runner, error-column semantics, and 0-1 score normalization
    are the real machinery; the mock's formula (distinct-unigram recall +
    length-bounded coherence) lets DuckDB check every row."""
    from ..metrics.judge import MockJudge, llm_judge_scores

    d = _t(spark, sf_dir, "documents")
    toks = tokenize_ws("text")
    pair = d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 60), " ").alias("summary"),
        F.array_join(F.slice(toks, 31, 90), " ").alias("reference"),
    )
    scored = llm_judge_scores(pair, MockJudge())
    return scored.select(
        "doc_id",
        F.round("llm_correctness", 6).alias("llm_correctness"),
        F.round("llm_coherence", 6).alias("llm_coherence"),
        "status",
    )


# ---------------------------------------------------------------------------
# end-to-end pipeline queries (the reference's approaches, mock summarizer)
# ---------------------------------------------------------------------------


@query(
    "pipeline_truncated_mock",
    oracle=f"""
SELECT doc_id,
       array_to_string(list_slice({_DUCK_TOKS}, 1, 64), ' ') AS summary
FROM documents
""",
)
def pipeline_truncated_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated approach end-to-end (EP1 stage c for approach='truncated')
    with the deterministic mock: truncate (F6/F7) -> summarize -> clean (F5).
    The oracle is the algebraic collapse of the whole pipeline: first
    min(64, n) tokens."""
    from ..summarize import MockSummarizer, truncated_summarize

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return truncated_summarize(d, MockSummarizer(64), max_input_tokens=16384)


@query(
    "pipeline_mapreduce_mock",
    oracle=f"""
SELECT doc_id,
       array_to_string(list_slice({_DUCK_TOKS}, 1, 24), ' ') AS summary
FROM documents
""",
)
def pipeline_mapreduce_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-reduce approach end-to-end with the mock summarizer: chunk ->
    map -> greedy bucket -> recursive collapse -> final reduce -> clean.

    On this corpus the pipeline has a closed form the oracle can check:
    every doc is <= ~100 tokens, so map outputs total <= 48 <= token_max
    (zero collapse rounds — the driver loop is exercised but never fires),
    and the final mock reduce keeps the first 24 tokens of the first chunk's
    summary, i.e. the doc's first min(24, n) tokens. Non-trivial collapse
    rounds are cross-engine-checked by mock_collapse_loop/-level and golden-
    tested for round counts in tests/test_plans_and_topology.py.

    Precondition (as in pipeline_iterative_mock): multi-chunk docs' first
    chunk carries >= 24 tokens, else overlap-duplicated tokens would enter
    the first-24 slice and fail parity loudly."""
    from ..summarize import MockSummarizer, mapreduce_summarize

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return mapreduce_summarize(
        d, MockSummarizer(24), chunk_size=60, chunk_overlap=10, token_max=80
    )


@query(
    "pipeline_iterative_mock",
    oracle=f"""
SELECT doc_id,
       array_to_string(list_slice({_DUCK_TOKS}, 1, 32), ' ') AS summary
FROM documents
""",
)
def pipeline_iterative_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative-refinement approach end-to-end: per-doc left fold in
    chunk_idx order inside applyInPandas (D11) — sequential within a doc,
    parallel across docs.

    With the first-k-tokens mock the fold has a closed form — once the
    running summary reaches k tokens, refining can't change it, so the
    result is exactly the doc's first min(k, n) tokens. The oracle checks
    that closed form, which pins BOTH the mock semantics and the fold's
    ordering (any out-of-order fold would surface non-prefix tokens).

    Precondition: every multi-chunk doc's FIRST chunk carries >= k=32
    tokens (true for chunk_size=60 on this corpus; verified across all
    shipped scale factors) — a shorter first chunk would pull overlap-
    duplicated tokens into positions k0+1..k and fail parity loudly."""
    from ..summarize import MockSummarizer, iterative_refine_summarize

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return iterative_refine_summarize(d, MockSummarizer(32), chunk_size=60)


@query(
    "pipeline_critique_mock",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
b AS (SELECT doc_id, len(toks) AS n,
             '[PHẦN 1] ' || array_to_string(toks[1:least(19, len(toks))], ' ') AS s0,
             least(21, len(toks) + 2) AS m
      FROM t)
SELECT doc_id, CASE WHEN n = 0 THEN ''
                    WHEN m % 2 = 1 THEN '[refined] ' || s0
                    ELSE s0 END AS summary
FROM b
""",
)
def pipeline_critique_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-reduce + critique/refine end-to-end (D9/D10) with the mock
    summarizer and the parity mock critic.

    Closed form the oracle checks: on this corpus map outputs total
    <= 2 chunks x 21 tokens = 42, under token_max=100 and the
    pre-collapse threshold 50, so only the FINAL critique-reduce runs.
    Its section-tagged input starts "[PHẦN 1]\\n<s1>" where s1 is a prefix
    of the doc, hence initial = "[PHẦN 1] " + first min(19, n) doc tokens
    with m = min(21, n+2) tokens total; MockCritic then refines exactly
    when m is odd (stop-phrase branch when even) — so BOTH critic branches
    run corpus-wide and the oracle pins tagging, truncation algebra, stop
    phrase, and refine marker. Non-trivial collapse rounds stay covered by
    mock_collapse_loop; the pre-collapse threshold branch by
    tests/test_critique_hierarchical.py.

    Precondition (as pipeline_mapreduce_mock): multi-chunk docs' first
    chunk carries >= 21 tokens, else overlap-duplicated tokens would enter
    the first-19 slice and fail parity loudly."""
    from ..summarize import MockCritic, MockSummarizer, mapreduce_critique_summarize

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return mapreduce_critique_summarize(
        d,
        MockSummarizer(21),
        MockCritic(),
        chunk_size=60,
        chunk_overlap=10,
        token_max=100,
        max_critique_iterations=2,
    )


@query(
    "pipeline_hierarchical_mock",
    oracle=f"""
WITH t AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_DUCK_TOKS} AS toks FROM documents),
h AS (SELECT doc_id, toks, len(toks) AS n, CAST(floor(len(toks) / 2) AS INT) AS hf FROM t),
parts AS (
  SELECT doc_id,
         list_concat(
           CASE WHEN hf = 0 THEN ['Part', '1']
                ELSE list_concat(['Part', '1:', 'Part', '1'], toks[1:least(hf, 22)]) END,
           CASE WHEN n - hf = 0 THEN ['Part', '2']
                ELSE list_concat(['Part', '2:', 'Part', '2'],
                                 toks[hf + 1:hf + least(n - hf, 22)]) END
         ) AS l
  FROM h)
SELECT doc_id, array_to_string(l[1:24], ' ') AS summary FROM parts
""",
)
def pipeline_hierarchical_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical tree collapse end-to-end (D12-D17): each document is
    lifted into a two-section tree (Document -> Header -> Paragraph), then
    collapsed bottom-up.

    Closed form the oracle checks, with hf = floor(n/2) the Part-1 half:
    each Header's section input "Part i\\n\\nbody" is single-chunk (body
    <= ~50 tokens), so its summary is the first 24 tokens = "Part i" +
    first 22 body tokens, spliced back as "Part i:\\n<summary>"; an empty
    half keeps the bare title (F8 guard). The final doc-level reduce sees
    at most 8 + 22 + 22 = 52 tokens (single chunk again) and keeps the
    first 24; the polish pass is idempotent on a 24-token mock summary.
    The oracle therefore pins descendant gathering, node-order assembly,
    title splicing, the empty-body guard, and the level-collapse loop in
    one expression. Deeper trees / multi-round collapses stay covered by
    tests/test_critique_hierarchical.py golden tests."""
    from ..summarize import MockSummarizer, hierarchical_summarize

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    trees = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _two_part_tree_json().alias("tree_json"),
    )
    return hierarchical_summarize(
        trees, MockSummarizer(24), max_depth=1, chunk_size=60, chunk_overlap=10, token_max=80
    )


def _two_part_tree_json() -> F.Column:
    """Document -> 2x Header("Part i") -> Paragraph tree as a JSON string
    column over (doc_id, text): the shared fixture shape of
    ``pipeline_hierarchical_mock`` (in-memory trees) and
    ``tree_file_hierarchical`` (trees round-tripped through a
    document_tree.json file), so both share one closed-form oracle."""
    from ..functions.text import tokenize_ws as _tok

    toks = _tok("text")
    half = (F.size(toks) / 2).cast("int")
    leaf = lambda txt: F.struct(F.lit("Paragraph").alias("type"), txt.alias("text"))  # noqa: E731
    header = lambda title, body: F.struct(  # noqa: E731
        F.lit("Header").alias("type"), F.lit(title).alias("text"), F.array(leaf(body)).alias("children")
    )
    return F.to_json(
        F.struct(
            F.lit("Document").alias("type"),
            F.col("doc_id").cast("string").alias("text"),
            F.array(
                header("Part 1", F.array_join(F.slice(toks, 1, half), " ")),
                header("Part 2", F.array_join(F.slice(toks, half + 1, F.size(toks)), " ")),
            ).alias("children"),
        )
    )


# bump when _two_part_tree_json / the fixture layout changes: the fixture
# cache key includes it, so stale /tmp fixtures can't outlive the builder
_TREE_FIXTURE_VERSION = 2


def build_tree_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the reference's corpus-tree layout
    (``document_tree.json``: one Root whose children are Document subtrees,
    run_full_evaluation_pipeline.py:505-525) from the documents table, and
    return the fixture directory.

    DRIVER-SIDE by design: the reference artifact is a single JSON value, so
    assembling it is inherently a collect — this is test scaffolding for the
    S3 file-source path, not a pipeline operator (pipelines keep trees as a
    column; see ``pipeline_hierarchical_mock``). Content is deterministic in
    the input, so the overwrite is idempotent per sf_dir."""
    import hashlib as _hl
    import os
    import tempfile

    # dir keyed on (sf_dir, source-parquet stat, builder version) —
    # uid-scoped against foreign same-named dirs on a shared /tmp. The
    # content is deterministic in those inputs, so an existing fixture
    # short-circuits BEFORE the corpus collect (which must not run on
    # every invocation of a driver-gate/bench flagship query), while a
    # regenerated documents table (mtime/size change) or a builder change
    # (version bump) keys a fresh dir instead of silently reusing a stale
    # fixture.
    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        stat_key = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        stat_key = "nostat"
    digest = _hl.md5(
        f"{sf_dir}\x00{stat_key}\x00v{_TREE_FIXTURE_VERSION}".encode()
    ).hexdigest()[:16]
    fixture_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_tree_fixture_{os.getuid()}_{digest}"
    )
    target = os.path.join(fixture_dir, "document_tree.json")
    if os.path.exists(target):
        # refresh the dir mtime on reuse: the GC sweep below (run by OTHER
        # sessions' builds) keys idleness on mtime, which reads never
        # touch — without this, a >1h-old fixture still in active use
        # could be rmtree'd mid-read by a concurrent session's sweep
        try:
            os.utime(fixture_dir, None)
        except OSError:
            pass
        return fixture_dir
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    docs = (
        d.select(F.col("doc_id").cast("string").alias("doc_id"), _two_part_tree_json().alias("tj"))
        .orderBy(F.col("doc_id").cast("long"))
        .collect()
    )
    root = '{"type": "Root", "text": "", "children": [' + ", ".join(r.tj for r in docs) + "]}"
    os.makedirs(fixture_dir, exist_ok=True)
    # write-tmp-then-os.replace: a concurrent reader never sees a
    # half-written file
    fd, tmp = tempfile.mkstemp(dir=fixture_dir, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write(root)
    os.replace(tmp, target)
    # garbage-collect superseded fixtures (stat/version changes orphan the
    # old digest dirs): best-effort, only dirs idle > 1h so a concurrent
    # session's live fixture is never yanked
    import glob as _glob
    import shutil as _shutil
    import time as _time

    prefix = os.path.join(tempfile.gettempdir(), f"spark_graft_tree_fixture_{os.getuid()}_")
    for d in _glob.glob(prefix + "*"):
        if d != fixture_dir:
            try:
                if _time.time() - os.path.getmtime(d) > 3600:
                    _shutil.rmtree(d, ignore_errors=True)
            except OSError:
                pass
    return fixture_dir


@query("tree_file_hierarchical", oracle=ORACLES["pipeline_hierarchical_mock"])
def tree_file_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 + D12-D17 pinned together through a real FILE source: generate the
    reference-layout ``document_tree.json`` fixture, then run the reference's
    exact consumption path — ``read_tree_json`` (binaryFile scan + eager
    validation) -> ``split_root_tree`` (Root -> per-Document rows) ->
    ``hierarchical_summarize`` (flatten, gather, collapse, polish).

    The fixture holds the same two-part trees ``pipeline_hierarchical_mock``
    builds in memory, so the output is identical and this query shares its
    closed-form oracle — the file round-trip (to_json -> disk -> parse)
    must be lossless for the row to stay green."""
    from ..summarize import MockSummarizer, hierarchical_summarize
    from ..summarize.hierarchical import read_tree_json, split_root_tree

    fixture_dir = build_tree_fixture(spark, sf_dir)
    trees = read_tree_json(spark, fixture_dir)
    # the corpus tree is ONE file -> one input partition; fan the per-doc
    # rows out before the (mapInPandas-heavy) flatten/collapse stages
    per_doc = split_root_tree(trees.select("tree_json")).repartition(
        spark.sparkContext.defaultParallelism
    )
    return hierarchical_summarize(
        per_doc, MockSummarizer(24), max_depth=1, chunk_size=60, chunk_overlap=10, token_max=80
    )


@query(
    "embedding_label_centroids",
    oracle="""
SELECT label, CAST(i - 1 AS INT) AS dim,
       round(avg(embedding[i]::DOUBLE), 6) AS centroid
FROM embeddings, generate_series(1, 64) AS gs(i)
GROUP BY label, i
""",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (array agg shape): posexplode + hash agg — the
    map-side partial agg means only 64 x n_labels rows shuffle."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid"))
    )


_DUCK_BUCKET = (
    "list_reduce(list_prepend(0, list_transform(string_split_regex({tok}, ''), "
    "c -> unicode(c))), (a, x) -> (a * 31 + x) % 1000003) % 4093"
)


@query(
    "bertscore_mock_pairs",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
pair AS (SELECT doc_id, toks[1:40] AS cand, toks[21:60] AS ref FROM t),
bk AS MATERIALIZED (
  SELECT doc_id,
         list_transform(cand, t -> {_DUCK_BUCKET.format(tok='t')}) AS cb,
         list_transform(ref, t -> {_DUCK_BUCKET.format(tok='t')}) AS rb
  FROM pair),
pr AS (
  SELECT doc_id,
         CASE WHEN len(cb) = 0 THEN 0.0
              ELSE len(list_filter(cb, b -> list_contains(rb, b))) / len(cb) END AS p,
         CASE WHEN len(rb) = 0 THEN 0.0
              ELSE len(list_filter(rb, b -> list_contains(cb, b))) / len(rb) END AS r
  FROM bk)
SELECT doc_id, round(p, 6) AS bert_precision, round(r, 6) AS bert_recall,
       round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS bert_f1
FROM pr
""",
)
def bertscore_mock_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BERTScore greedy-match P/R/F1 (M2, reference EVAL:150-166) over
    (candidate, reference) pairs derived from overlapping token windows of
    each document, scored with the hard-match (one-hot-bucket) kernel —
    the Catalyst path of metrics.bertscore, per-row array expressions only
    (zero shuffle; the soft hashed-trigram encoder path is
    equivalence-tested against this in tests/test_metrics.py)."""
    from ..metrics.bertscore import bertscore_hard_match

    d = _t(spark, sf_dir, "documents", spread=True)
    toks = tokenize_ws("text")
    pairs = d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 40), " ").alias("candidate"),
        F.array_join(F.slice(toks, 21, 40), " ").alias("reference"),
    )
    return bertscore_hard_match(pairs).select(
        "doc_id",
        F.round("bert_precision", 6).alias("bert_precision"),
        F.round("bert_recall", 6).alias("bert_recall"),
        F.round("bert_f1", 6).alias("bert_f1"),
    )


@query("bpe_token_counts")
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics with the vendored BPE-ish tokenizer (C1,
    reference run_full_evaluation_pipeline.py:348-349 / utils/
    calculate_tokens.py:10-11 — there with the Qwen tokenizer, here with
    functions.bpe's deterministic stand-in since ``transformers`` is not
    assumed). Arrow-batched pandas UDF over the scan, then a tiny 1-row agg:
    the iterative per-pretoken merge loop is inherently imperative, hence
    rows-only (no SQL oracle). Scale shape: embarrassingly parallel scan;
    only (lang, partial sums) shuffle."""
    from ..functions.text import bpe_token_count_udf

    d = _t(spark, sf_dir, "documents", spread=True)
    cnt = bpe_token_count_udf()
    per_doc = d.select(
        "lang",
        cnt(F.col("text")).alias("bpe_tokens"),
        ws_token_count("text").alias("ws_tokens"),
        F.length("text").alias("chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("chars").alias("total_chars"),
            F.round(F.avg("bpe_tokens"), 4).alias("avg_bpe_tokens"),
            F.round(F.sum("chars") / F.sum("bpe_tokens"), 4).alias("chars_per_bpe_token"),
        )
    )


@query(
    "events_dedup_first_per_minute",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle="""
WITH r AS (
  SELECT user_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id, event_type, time_bucket(INTERVAL 1 MINUTE, ts)
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type, count(*) AS n_kept, round(sum(value), 4) AS kept_value
FROM r WHERE rn = 1
GROUP BY event_type
""",
)
def events_dedup_first_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.dedup_events_stream``
    (``dropDuplicatesWithinWatermark`` keep-first semantics, §2.10): one
    surviving event per (user, type, event-time minute) — deterministic
    keep-first by (ts, event_id) — then a per-type rollup of survivors.
    The streaming path holds only the watermark horizon in state; this twin
    replays the same keep-first rule over the full table so the rule itself
    is oracle-checked (the 3-batch watermark behavior is pinned in
    tests/test_streaming.py)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.window("ts", "1 minute")["start"]
    ).orderBy("ts", "event_id")
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum("value"), 4).alias("kept_value"),
        )
    )


@query(
    "events_resample_1h_ffill",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle="""
WITH h AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
                  arg_max(value, event_id) AS v
           FROM events GROUP BY 1, 2),
sp AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
              date_trunc('hour', max(ts)) AS h1
       FROM events GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
         FROM sp),
j AS (SELECT g.user_id, g.bucket, h.v FROM grid g
      LEFT JOIN h ON h.user_id = g.user_id AND h.bucket = g.bucket)
SELECT user_id, bucket,
       round(last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING), 6) AS value,
       v IS NOT NULL AS is_observed
FROM j
""",
)
def events_resample_1h_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resampling with forward fill (operators/timeseries.py
    resample_ffill): the gap-fill that turns an irregular event stream into
    a regular series — one row per hour from each user's first to last
    event, carrying the bucket's last observation (arg-max by the unique
    event_id, deterministic under timestamp ties) across empty hours. Grid
    size is bounded by calendar span, never event volume. The oracle
    replays bucketing, span grid, and the ignore-nulls fill."""
    from ..operators.timeseries import resample_ffill

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    out = resample_ffill(ev)
    return out.select(
        "user_id", "bucket", F.round("value", 6).alias("value"), "is_observed"
    )


@query(
    "events_trailing_24h_stats",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle="""
SELECT user_id, event_id,
       round(avg(value) OVER w, 6) AS avg_24h,
       count(*) OVER w AS n_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
""",
)
def events_trailing_24h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h per-user rolling statistics via a RANGE (value-based)
    window frame — the time-interval frame class, distinct from the ROWS
    frames the running-spend/gap queries pin. Ordering is unix MICROS so
    the inclusive 24h boundary matches DuckDB's timestamp-interval frame
    exactly (a seconds cast would truncate sub-second edges). Frames are
    bounded by event rate x 24h, independent of history length."""
    ev = _t(spark, sf_dir, "events")
    # the harness loader yields TIMESTAMP_NTZ; the session is pinned UTC,
    # so the cast to (instant) TIMESTAMP is an identity relabeling
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(micros).rangeBetween(
        -86_400_000_000, 0
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("avg_24h"),
        F.count(F.lit(1)).over(w).alias("n_24h"),
    )


@query(
    "minhash_md5_star_dedup",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle=f"""
WITH t AS (SELECT doc_id, list_transform({_DUCK_TOKS}, x -> lower(x)) AS toks
           FROM documents),
e AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
    FROM t WHERE len(toks) >= 3),
hi AS (SELECT doc_id, i,
              min(('0x' || substring(md5(i::VARCHAR || ':' || sh), 1, 15))::BIGINT) AS h
       FROM e, unnest(range(16)) AS u(i)
       GROUP BY doc_id, i),
sigs AS MATERIALIZED (SELECT doc_id, list(h ORDER BY i) AS sig FROM hi GROUP BY doc_id),
bands AS MATERIALIZED (
    SELECT doc_id, b, sig[b*4+1:b*4+4]::VARCHAR AS bk
    FROM sigs, unnest(range(4)) AS u(b)),
starred AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY b, bk) AS rep FROM bands),
cand AS (SELECT DISTINCT rep AS id1, doc_id AS id2 FROM starred WHERE doc_id <> rep),
paired AS (SELECT id1, id2,
                  len(list_filter(range(1, 17), i -> s1.sig[i] = s2.sig[i])) / 16.0 AS est
           FROM cand
           JOIN sigs s1 ON s1.doc_id = cand.id1
           JOIN sigs s2 ON s2.doc_id = cand.id2)
SELECT id1, id2, round(est, 6) AS est_jaccard
FROM paired WHERE est >= 0.5
""",
)
def minhash_md5_star_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-edge LSH banding on the md5 twin family (operators/dedup.py
    minhash_lsh_star_candidates): each band bucket emits only
    (bucket-min, member) pairs — O(k) per k-member bucket where the clique
    join is O(k^2), the viral-cluster mitigation measured in SCALE.md
    (13,805,902 -> 106,562 pairs on the skew-stress corpus at threshold 0,
    where components are identical). The oracle replays signatures, banding, the
    per-bucket window min, and the agreement filter bit-for-bit."""
    from ..operators.dedup import minhash_md5_pairs

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return minhash_md5_pairs(d, threshold=0.5, star=True)


@query(
    "minhash_md5_incremental_dedup",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle=f"""
WITH t AS (SELECT doc_id, list_transform({_DUCK_TOKS}, x -> lower(x)) AS toks
           FROM documents),
e AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
    FROM t WHERE len(toks) >= 3),
hi AS (SELECT doc_id, i,
              min(('0x' || substring(md5(i::VARCHAR || ':' || sh), 1, 15))::BIGINT) AS h
       FROM e, unnest(range(16)) AS u(i)
       GROUP BY doc_id, i),
sigs AS MATERIALIZED (SELECT doc_id, list(h ORDER BY i) AS sig FROM hi GROUP BY doc_id),
bands AS MATERIALIZED (
    SELECT doc_id, b, sig[b*4+1:b*4+4]::VARCHAR AS bk
    FROM sigs, unnest(range(4)) AS u(b)),
cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
         FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id),
paired AS (SELECT id1, id2,
                  len(list_filter(range(1, 17), i -> s1.sig[i] = s2.sig[i])) / 16.0 AS est
           FROM cand
           JOIN sigs s1 ON s1.doc_id = cand.id1
           JOIN sigs s2 ON s2.doc_id = cand.id2)
SELECT id1, id2, round(est, 6) AS est_jaccard
FROM paired
WHERE est >= 0.5 AND (id1 >= 400 OR id2 >= 400)
""",
)
def minhash_md5_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection (operators/dedup.py
    minhash_incremental_pairs): docs with id >= 400 play the "new batch",
    the rest the stored corpus — the increment pays one batch-vs-corpus
    band join plus the tiny batch self-join instead of the full corpus
    self-join. Result == the full md5-family pair set restricted to pairs
    touching a new doc, which is exactly what the oracle computes."""
    from ..operators.dedup import minhash_incremental_pairs, minhash_md5_signatures

    docs = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    sigs = minhash_md5_signatures(docs).persist()
    new = sigs.filter(F.col("doc_id") >= 400)
    corpus = sigs.filter(F.col("doc_id") < 400)
    out = minhash_incremental_pairs(
        new, corpus, n_hashes=16, n_bands=4, threshold=0.5
    ).select("id1", "id2", F.round("est_jaccard", 6).alias("est_jaccard"))
    out._persisted_inputs = [sigs]
    return out


@query("minhash_star_fast")  # rows-only: xxhash64 family is Spark-specific
def minhash_star_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash star-banding twin: identical star-edge selection to
    minhash_md5_star_dedup but the xxhash64 affine MinHash family (one JVM
    hash per shingle vs n_hashes full md5 digest+hex+parse chains — the
    default for non-harness callers, same convention as doc_winnow_fast).
    No SQL oracle exists for xxhash64, so this row is rows-only; star-edge
    correctness rides on the md5 twin's green oracle (identical banding
    code via minhash_lsh_star_candidates) plus the hash-agnostic
    star-vs-clique component-identity test in tests/test_dedup_similarity.py.
    Benches the true production cost of the viral-cluster escape hatch next
    to the oracle twin's md5 replayability tax."""
    from ..operators.dedup import minhash_dedup_pairs

    d = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    out = minhash_dedup_pairs(d, threshold=0.5, star=True)
    sel = out.select("id1", "id2", F.round("est_jaccard", 6).alias("est_jaccard"))
    # .select() builds a NEW DataFrame — carry the unpersist hook over or
    # unpersist_inputs(result) silently no-ops and the signature cache leaks
    sel._persisted_inputs = out._persisted_inputs
    return sel


@query("minhash_incremental_fast")  # rows-only: xxhash64 family is Spark-specific
def minhash_incremental_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash incremental twin: the minhash_md5_incremental_dedup
    shape (docs with id >= 400 as the "new batch" vs the stored corpus) on
    xxhash64 signatures. In production the corpus signatures are parquet'd
    once and only the batch is hashed; here both sides are computed
    in-query so the bench shows the worst-case increment cost with the
    cheap hash family. Rows-only (no SQL xxhash64); the batch-vs-corpus
    band-join logic is oracle-verified on the md5 twin (shared
    minhash_incremental_pairs code path)."""
    from ..operators.dedup import minhash_incremental_pairs, minhash_signatures

    docs = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    # include_missing=False: minhash_incremental_pairs filters sentinel
    # signatures on BOTH sides anyway, so the full-corpus-id left join that
    # include_missing pays to ADD them is computed only to be discarded —
    # same convention as minhash_dedup_pairs (result-identical: the
    # downstream sentinel filter defines the surviving set either way)
    sigs = minhash_signatures(docs, n_hashes=64, include_missing=False).persist()
    new = sigs.filter(F.col("doc_id") >= 400)
    corpus = sigs.filter(F.col("doc_id") < 400)
    out = minhash_incremental_pairs(
        new, corpus, n_hashes=64, n_bands=16, threshold=0.5
    ).select("id1", "id2", F.round("est_jaccard", 6).alias("est_jaccard"))
    out._persisted_inputs = [sigs]
    return out
