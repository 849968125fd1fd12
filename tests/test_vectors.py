"""Vector preprocessing functions: norms, normalization, int8 round-trip."""

import math

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.vectors import (
    int8_dequantize,
    int8_quantize,
    int8_scale,
    l2_norm,
    l2_normalize,
    quantization_error,
)


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.5])],
        "vid long, v array<double>",
    )


def test_l2_norm_and_normalize(spark, vecs):
    rows = {
        r["vid"]: (r["n"], r["u"])
        for r in vecs.select(
            "vid", l2_norm("v").alias("n"), l2_normalize("v").alias("u")
        ).collect()
    }
    assert rows[1][0] == pytest.approx(5.0)
    assert rows[1][1] == pytest.approx([0.6, 0.8])
    assert rows[2][1] == [0.0, 0.0]  # zero vector stays zero, no NaN
    assert math.hypot(*rows[3][1]) == pytest.approx(1.0)


def test_int8_roundtrip_error_within_half_step(spark, vecs):
    out = vecs.select(
        "vid",
        int8_scale("v").alias("s"),
        quantization_error("v", int8_scale("v")).alias("e"),
    ).collect()
    for r in out:
        assert r["e"] <= 0.5 / r["s"] + 1e-12


def test_quantize_exact_values(spark):
    df = spark.createDataFrame([(1, [1.0, -1.0, 0.5])], "vid long, v array<double>")
    row = df.select(
        int8_quantize("v", int8_scale("v")).alias("q"),
        int8_dequantize(int8_quantize("v", int8_scale("v")), int8_scale("v")).alias("d"),
    ).first()
    # scale = 127: floor(x*scale + 0.5) gives 127, floor(-126.5) = -127
    # (half-toward-minus-infinity — the engine-portable rule both the Spark
    # expression and the DuckDB oracle implement), and floor(63.5+0.5) = 64
    assert row["q"][0] == 127
    assert row["q"][1] == -127
    assert row["q"][2] == 64
    assert row["d"][0] == pytest.approx(1.0)
    assert row["d"][1] == pytest.approx(-1.0)
