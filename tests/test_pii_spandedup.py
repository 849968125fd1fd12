"""redact_pii / pii_counts / span_dedup: known-answer checks."""

import pytest
from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.pii import (
    pii_counts,
    redact_pii,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    span_dedup,
)


def test_redact_and_count_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org then 192.168.0.1 and +84-555-0123 done"),
            (2, "no pii here at all"),
            (3, None),
        ],
        "id long, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id", redact_pii("t").alias("red"), pii_counts("t").alias("c")
        ).collect()
    }
    assert out[1]["red"] == "mail [EMAIL] then [IP] and [PHONE] done"
    assert (out[1]["c"]["email"], out[1]["c"]["phone"], out[1]["c"]["ipv4"]) == (1, 1, 1)
    assert out[2]["red"] == "no pii here at all"
    assert out[3]["red"] is None  # NULL propagates through redaction
    assert (out[3]["c"]["email"], out[3]["c"]["phone"], out[3]["c"]["ipv4"]) == (0, 0, 0)


def test_redact_multiple_and_extended_phone(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co b@c.io +1-800-555-1234 10.0.0.1 10.0.0.2")], "id long, t string"
    )
    r = df.select(redact_pii("t").alias("red"), pii_counts("t").alias("c")).first()
    assert r["red"] == "[EMAIL] [EMAIL] [PHONE] [IP] [IP]"
    assert (r["c"]["email"], r["c"]["phone"], r["c"]["ipv4"]) == (2, 1, 2)


def _spans(spark, rows, w, key="hash"):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in span_dedup(df, span_tokens=w, dedup_key=key).collect()
    }


@pytest.mark.parametrize("key", ["hash", "text"])
def test_span_dedup_keeps_first_occurrence(spark, key):
    # doc 1 spans: "a b", "c d"; doc 2 repeats "a b" then adds "e f";
    # doc 3 is entirely doc 1's spans -> empty husk
    rows = [(1, "a b c d"), (2, "a b e f"), (3, "c d a b")]
    got = _spans(spark, rows, 2, key)
    assert got[1]["text"] == "a b c d" and got[1]["n_removed"] == 0
    assert got[2]["text"] == "e f" and got[2]["n_removed"] == 1
    assert got[3]["text"] == "" and got[3]["n_removed"] == 2
    assert got[3]["n_spans"] == 2


def test_span_dedup_within_doc_repeats(spark):
    got = _spans(spark, [(1, "x y x y x y")], 2)
    assert got[1]["text"] == "x y" and got[1]["n_removed"] == 2


def test_span_dedup_bad_key(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dedup_key"):
        span_dedup(df, dedup_key="md5")


def test_span_dedup_plan_two_exchanges(spark):
    # the scale contract: ONE shuffle keyed by span (keep-first window) +
    # ONE shuffle back on doc id for reassembly — nothing else
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = span_dedup(df, span_tokens=2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan


def test_pii_redact_plan_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "id long, t string")
    out = df.select(redact_pii("t").alias("r"), pii_counts("t").alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan


def test_span_dedup_empty_null_whitespace(spark):
    # empty input -> empty output; null/blank docs yield one degenerate
    # span each ('' after reassembly) — all rows survive as husks, and
    # blank-text spans dedupe against each other like any other span
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert span_dedup(empty).count() == 0
    got = _spans(spark, [(1, None), (2, ""), (3, "   ")], 2)
    assert set(got) == {1, 2, 3}
    assert all(got[i]["text"] == "" for i in (1, 2, 3))
    # NULL text chunks like EMPTY text (chunk_fixed_tokens' unified NULL
    # contract), so all three docs carry the same '' span: doc 1 is the
    # first occurrence (kept), docs 2 and 3 dedupe against it — no more
    # special xxhash64(NULL) bucket treating missing text as unique content
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 1
    assert got[3]["n_removed"] == 1


def test_pii_counts_match_emitted_tags_on_nested_matches(spark):
    """An IPv4 inside an email local-part is ONE [EMAIL] redaction; the
    audit counts must agree (sequential counting), not report a phantom
    un-redacted IP."""
    df = spark.createDataFrame([("reach 1.2.3.4@example.com now",)], ["t"])
    r = df.select(redact_pii("t").alias("red"), pii_counts("t").alias("c")).first()
    assert r.red == "reach [EMAIL] now"
    assert (r.c.email, r.c.phone, r.c.ipv4) == (1, 0, 0)
