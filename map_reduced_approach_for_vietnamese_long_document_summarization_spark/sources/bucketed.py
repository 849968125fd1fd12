"""Bucketed-table sink/source: co-located, shuffle-free joins at scale.

At 100 TB the dominant join cost is the shuffle. Writing both sides of a
recurring join bucketed by the join key (``bucketBy(n, key).sortBy(key)``)
lets Spark's sort-merge join read matching buckets directly — zero Exchange
in the plan. This is the persistent-layout complement to the per-query
``broadcast()`` and salting strategies in ``operators``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — with matching
    bucket counts the physical plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
