from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def test_salted_agg_matches_plain_groupby(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)] + [("cold", 1.0), ("cold", 2.0)],
        ["k", "v"],
    )
    out = {
        r.k: (r.n, r.total)
        for r in salted_agg(
            df, ["k"], [(F.count(F.lit(1)), F.sum, "n"), (F.sum("v"), F.sum, "total")]
        ).collect()
    }
    assert out["hot"] == (500, sum(float(i) for i in range(500)))
    assert out["cold"] == (2, 3.0)


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(300)] + [("cold", 0)], ["k", "i"]
    )
    right = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "tag"])
    salted = salted_join(left, right, "k", salt=4)
    plain = left.join(right, "k")
    assert salted.count() == plain.count() == 301
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
