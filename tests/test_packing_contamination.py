"""pack_sequences / ngram_contamination: known-answer packing bins and
containment fractions."""

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.contamination import (
    ngram_contamination,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _packed(spark, rows, max_tokens, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = pack_sequences(df, max_tokens, n_shards=n_shards).collect()
    return {r["doc_id"]: (r["shard"], r["seq_id"]) for r in out}


def test_pack_fills_then_breaks(spark):
    # budget 100: docs 40+40 fit bin 0 (offsets 0, 40); third doc starts at
    # offset 80 -> still bin 0 by start-offset rule; fourth starts at 120 -> bin 1
    got = _packed(spark, [(1, 40), (2, 40), (3, 40), (4, 40)], 100)
    assert got[1][1] == 0 and got[2][1] == 0 and got[3][1] == 0
    assert got[4][1] == 1


def test_oversized_doc_gets_own_bin(spark):
    got = _packed(spark, [(1, 600), (2, 10)], 512)
    assert got[1][1] == 0
    assert got[2][1] == 1  # starts at offset 600 -> next bin


def test_sharding_is_deterministic_function_of_id(spark):
    rows = [(i, 10) for i in range(32)]
    a = _packed(spark, rows, 64, n_shards=4)
    b = _packed(spark, list(reversed(rows)), 64, n_shards=4)
    assert a == b
    assert {s for s, _ in a.values()} == {0, 1, 2, 3}


def test_packing_stats_fill_frac(spark):
    df = spark.createDataFrame([(1, 256), (2, 128)], "doc_id long, n_tokens int")
    stats = packing_stats(pack_sequences(df, 512, n_shards=1), 512).collect()
    assert len(stats) == 1
    assert stats[0]["n_docs"] == 2
    assert stats[0]["sum_tokens"] == 384
    assert float(stats[0]["fill_frac"]) == 0.75


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contained_test_doc_scores_one(spark):
    train = _docs(spark, [(1, "a b c d e f g h")])
    test = _docs(spark, [(10, "b c d e")])  # shingles: b c d, c d e — both in train
    out = ngram_contamination(train, test).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["test_id"], r["train_id"], r["n_common"]) == (10, 1, 2)
    assert float(r["containment"]) == 1.0


def test_disjoint_docs_emit_no_pair(spark):
    train = _docs(spark, [(1, "a b c d")])
    test = _docs(spark, [(10, "x y z w")])
    assert ngram_contamination(train, test).count() == 0


def test_threshold_filters_low_overlap(spark):
    train = _docs(spark, [(1, "a b c x y z q r s")])
    test = _docs(spark, [(10, "a b c d e f")])  # 1 shared shingle of 4
    out = ngram_contamination(train, test, threshold=0.5)
    assert out.count() == 0
    out2 = ngram_contamination(train, test, threshold=0.25).collect()
    assert len(out2) == 1 and float(out2[0]["containment"]) == 0.25


def test_stop_shingle_cap_drops_common_shingle(spark):
    # the shared shingle appears in 3 train docs; cap 2 removes it entirely
    train = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "a b c")])
    test = _docs(spark, [(10, "a b c")])
    assert ngram_contamination(train, test, max_doc_freq=2).count() == 0
    assert ngram_contamination(train, test, max_doc_freq=3).count() == 3


def test_contamination_pair_gen_arms_identical(spark):
    """r14 optimization pin: the grouped per-side posting-list arm must emit
    exactly the posting equi-join arm's rows for every parameter combination
    — doc-freq cap, threshold, top_k, and uncapped."""
    train = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d"),
            (3, "a b c"),
            (4, "q r s t u"),
            (5, None),
        ],
    )
    test = _docs(spark, [(10, "b c d e"), (11, "a b c"), (12, "x y z"), (13, "")])
    for kw in (
        {},
        {"max_doc_freq": 1},
        {"max_doc_freq": 2},
        {"threshold": 0.5},
        {"top_k": 2},
        {"max_doc_freq": 3, "threshold": 0.25, "top_k": 3},
    ):
        a = sorted(
            tuple(r)
            for r in ngram_contamination(train, test, pair_gen="posting", **kw).collect()
        )
        b = sorted(
            tuple(r)
            for r in ngram_contamination(train, test, pair_gen="grouped", **kw).collect()
        )
        assert a == b, (kw, a, b)


def _packed_greedy(spark, rows, max_tokens, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = pack_sequences(df, max_tokens, n_shards=n_shards, mode="greedy").collect()
    return {r["doc_id"]: (r["shard"], r["seq_id"]) for r in out}


def test_pack_greedy_hard_budget(spark):
    # budget 100: 40+40 fill bin 0; adding the third 40 would hit 120 -> it
    # opens bin 1 (the offset rule keeps it in bin 0 at 120 tokens)
    got = _packed_greedy(spark, [(1, 40), (2, 40), (3, 40), (4, 40)], 100)
    assert got[1][1] == 0 and got[2][1] == 0
    assert got[3][1] == 1 and got[4][1] == 1


def test_pack_greedy_oversize_isolated_even_unaligned(spark):
    # doc 2 (600 > budget) arrives mid-bin: greedy isolates it (the ADVICE
    # case the offset rule gets wrong), and the bin after it reopens fresh
    got = _packed_greedy(spark, [(1, 40), (2, 600), (3, 10), (4, 10)], 512)
    assert got[1][1] == 0
    assert got[2][1] == 1
    assert got[3][1] == 2 and got[4][1] == 2


def test_pack_greedy_never_exceeds_budget_unless_single_oversize(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(1, 200)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    packed = pack_sequences(df, 256, n_shards=4, mode="greedy")
    stats = packing_stats(packed, 256).collect()
    over = [r for r in stats if r["sum_tokens"] > 256]
    assert not over  # no doc exceeds 200 < 256, so NO bin may overflow

    # mode validation fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        pack_sequences(df, 256, mode="nope")
