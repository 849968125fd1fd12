import contextlib
import io

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "t_orders_b", "o_custkey", 8)
    write_bucketed(customers, "t_cust_b", "o_custkey", 8)
    try:
        # disable broadcast so the bucketed sort-merge path is observable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_orders_b", "t_cust_b", "o_custkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: no shuffle either side
        # and results equal the plain join
        plain = orders.join(customers, "o_custkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
