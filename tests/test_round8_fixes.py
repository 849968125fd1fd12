"""Round-8 regression tests: the round-7 ADVICE fixes (DATE time axes,
NULL LSH signatures, state-schema migration hint) and the perf-tax
adjudications (rouge re-keying, bloom persist gate)."""

import pytest
from pyspark.sql import functions as F


def test_interval_join_date_axis(spark):
    """A DATE-typed time axis must bucket via the timestamp round-trip —
    date->double is not a valid cast (round-7 ADVICE)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.interval import (
        interval_join,
    )

    points = spark.createDataFrame(
        [("2024-01-02",), ("2024-02-15",)], "d string"
    ).select(F.col("d").cast("date").alias("d"))
    intervals = spark.createDataFrame(
        [("2024-01-01", "2024-01-31", "jan")], "s string, e string, label string"
    ).select(
        F.col("s").cast("date").alias("s"),
        F.col("e").cast("date").alias("e"),
        "label",
    )
    out = interval_join(
        points, intervals, bucket_seconds=7 * 86400, point_time="d",
        start="s", end="e",
    ).collect()
    assert [(r.d.isoformat(), r.label) for r in out] == [("2024-01-02", "jan")]


def test_asof_join_date_axis_with_tolerance(spark):
    """DATE axes through asof_join's tolerance arithmetic (same dispatch
    rule as interval_join)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.asof import (
        asof_join,
    )

    left = spark.createDataFrame([(1, "2024-01-10")], "k long, t string").select(
        "k", F.col("t").cast("date").alias("t")
    )
    right = spark.createDataFrame(
        [(1, "2024-01-08", "near"), (1, "2023-01-01", "far")],
        "k long, rt string, v string",
    ).select("k", F.col("rt").cast("date").alias("rt"), "v")
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        tolerance_seconds=5 * 86400,
    ).collect()
    assert len(out) == 1 and out[0]["v_right"] == "near"


def test_lsh_band_table_null_signature_rows_emit_no_bands(spark):
    """NULL signatures are 'no signature': zero band rows (never a
    candidate), not a raise_error claiming '-1 hashes' (round-7 ADVICE).
    Genuinely short arrays still raise."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        lsh_band_table,
    )

    df = spark.createDataFrame(
        [(1, [10, 20, 30, 40]), (2, None)],
        "doc_id long, minhash array<bigint>",
    )
    out = lsh_band_table(df, n_hashes=4, n_bands=2, sig_col="minhash")
    rows = out.collect()
    assert sorted({r.doc_id for r in rows}) == [1]
    assert len(rows) == 2  # doc 1's two bands only

    short = spark.createDataFrame(
        [(3, [1, 2])], "doc_id long, minhash array<bigint>"
    )
    with pytest.raises(Exception, match="short|n_hashes"):
        lsh_band_table(short, n_hashes=4, n_bands=2, sig_col="minhash").collect()


def test_state_schema_migration_hint_matches_cause_chain():
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.streaming import (
        state_schema_migration_hint,
    )

    inner = RuntimeError(
        "[STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE] Provided value schema ..."
    )
    outer = RuntimeError("query terminated")
    outer.__cause__ = inner
    hint = state_schema_migration_hint(outer)
    assert hint is not None and "checkpointLocation" in hint
    assert state_schema_migration_hint(RuntimeError("boring")) is None


def test_rouge_n_f1_df_duplicate_ids_still_independent(spark):
    """The xxhash64-keyed re-keying window (round-7 VERDICT item 1) must
    keep duplicate-id rows' multisets separate — scores stay <= 1 and each
    row scores against its own pair."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.rouge import (
        rouge_n_f1_df,
        rouge_pair,
    )

    rows = [
        (1, "a b c d", "a b x y"),
        (1, "a b c d", "a b x y"),  # exact duplicate row
        (1, "p q", "p q"),          # same id, different pair
        (2, "m n o", "m n z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, r string")
    got = sorted(
        round(x.rouge1, 9)
        for x in rouge_n_f1_df(df, 1).collect()
    )
    want = sorted(round(rouge_pair(g, r)[0], 9) for _, g, r in rows)
    assert got == want


def test_rouge_n_f1_df_carries_unpersist_hook(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics.rouge import (
        rouge_n_f1_df,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        unpersist_inputs,
    )

    df = spark.createDataFrame([(1, "a b", "a c")], "doc_id long, g string, r string")
    out = rouge_n_f1_df(df, 1)
    out.count()
    hooks = getattr(out, "_persisted_inputs", [])
    assert len(hooks) == 1 and hooks[0].storageLevel.useMemory
    unpersist_inputs(out)
    assert not hooks[0].storageLevel.useMemory


def test_bloom_persist_gated_on_expected_items(spark):
    """Below the 1M-key gate skip_existing_bloom must not persist (the
    round-7 1.55x local constant); at/above it the words table persists and
    rides the unpersist hook."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.pairing import (
        skip_existing_bloom,
    )

    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    existing = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    small = skip_existing_bloom(docs, existing, expected_items=1000)
    assert small._persisted_inputs == []
    assert small.count() == 30

    big = skip_existing_bloom(docs, existing, expected_items=2_000_000)
    assert len(big._persisted_inputs) == 1
    assert big.count() == 30
    big._persisted_inputs[0].unpersist()


def test_critique_pipeline_survives_all_null_summaries(spark):
    """A doc whose every chunk summary comes back NULL must not silently
    leave the critique collapse loop (NULL _total failed both the > and <=
    filters before the coalesce — same rule as collapse_until_fits), and
    NULL member texts must render as '' in the reduce input, not 'None'."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.critique import (
        mapreduce_critique_summarize,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.summarizer import (
        MockSummarizer,
    )

    class NullOnMarker(MockSummarizer):
        """NULL summary for chunks carrying the marker token."""

        def expr(self, col: Column) -> Column:
            return F.when(
                col.contains("XNULLX"), F.lit(None).cast("string")
            ).otherwise(super().expr(col))

        def __call__(self, texts):
            return texts.map(
                lambda t: None
                if t and "XNULLX" in t
                else " ".join((t or "").split()[: self.max_tokens])
            )

    docs = spark.createDataFrame(
        [
            (1, " ".join(["XNULLX"] * 40)),
            (2, " ".join(f"w{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    out = mapreduce_critique_summarize(
        docs,
        NullOnMarker(8),
        chunk_size=10,
        chunk_overlap=0,
        token_max=12,
        max_rounds=3,
    )
    rows = {r.doc_id: r.summary for r in out.collect()}
    assert set(rows) == {1, 2}            # both docs present
    assert "None" not in (rows[1] or "")  # NULL texts never render as 'None'
    assert rows[2]                        # the normal doc still summarizes
