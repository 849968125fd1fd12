"""Scale-stress of the round-4 operators on SKEWED synthetic shapes.

`stress_dedup_chain.py` stress-tested the near-dup chain; this script does
the same for the three round-4 operators whose scale claims were so far
argued from the plan, not measured:

* ``line_dedup`` — a boilerplate line shared by ~40k documents (the C4
  hazard: one hot line key must stay ONE window rank, not a pairwise
  product, and blank formatting lines must not fuse onto one key);
* ``interval_join`` — one user owning 50% of all intervals (the hot-key
  hazard: pair work per bucket is bounded by the bucket width, and the
  result must be bucket-width-INVARIANT — the same join at w=60s and
  w=3600s proves the bucketization met every pair exactly once);
* ``skip_existing_bloom`` — sized wrong in both directions:
  expected_items >> actual (oversized bloom: the (word,bits) table must
  stay sparse — rows bounded by n_hashes * |existing|, NOT by num_bits)
  and actual >> expected_items (saturated bloom: everything tests
  "maybe", the exact-mode rescue degrades gracefully to the plain
  anti-join and the answer stays EXACT).

All corpus synthesis is Spark-side (explode fan-out + repartition — the
fan-out keeps the parent's 1-2 parquet splits otherwise, the lesson from
stress_dedup_chain). Each stage prints wall time plus the skew artifact
that proves no single-task funnel.

    python examples/stress_round4_ops.py [sf_dir] [n_docs]

Results recorded in SCALE.md ("Round-4 operator skew stress").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
    line_dedup,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.interval import (
    interval_join,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.pairing import (
    skip_existing,
    skip_existing_bloom,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
)

BOILER = "subscribe to our newsletter for daily updates and exclusive offers"


def stress_line_dedup(spark, sf_dir: str, n_docs: int) -> float:
    """~n_docs docs x ~12 lines; 80% carry the SAME boilerplate line (the
    hot key), every doc has 2 blank lines and 8 unique content lines."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fan = max(1, n_docs // 5000)
    docs = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(fan - 1))))
        .select((F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"), "text")
        .repartition(64, "doc_id")
    )
    # 8 unique content lines from the doc's own tokens + salt, 2 blank
    # lines, and (80% of docs) the shared boilerplate line
    # fold ALL whitespace to single spaces first: a source corpus with real
    # newlines would otherwise leak un-prefixed fragment lines into the
    # synthetic docs and break the removed-count accounting below
    toks = F.split(
        F.regexp_replace(F.coalesce("text", F.lit("")), r"\s+", " "), " "
    )
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.concat_ws(
            " ",
            F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("_"), i.cast("string")),
            F.slice(toks, i * 5 + 1, 5).cast("string"),
        ),
    )
    has_boiler = F.pmod(F.xxhash64("doc_id"), F.lit(5)) < 4
    lines = F.concat(
        F.when(has_boiler, F.array(F.lit(BOILER))).otherwise(F.array().cast("array<string>")),
        F.slice(uniq, 1, 4),
        F.array(F.lit(""), F.lit("   ")),  # blank formatting lines
        F.slice(uniq, 5, 4),
    )
    corpus = docs.select("doc_id", F.array_join(lines, "\n").alias("text")).persist()
    n = corpus.count()
    n_boiler = corpus.filter(F.col("text").contains(BOILER)).count()
    print(f"line-dedup corpus: {n} docs, boilerplate in {n_boiler}")

    t0 = time.time()
    out = line_dedup(corpus).persist()
    total_removed = out.agg(F.sum("n_removed")).first()[0]
    survivors = out.filter(F.col("text").contains(BOILER)).count()
    wall = time.time() - t0
    # the hot line must survive exactly once; blank lines never dedup, so
    # removed == the n_boiler-1 dropped boilerplate copies
    assert survivors == 1, survivors
    assert total_removed == n_boiler - 1, (total_removed, n_boiler)
    per_doc = out.select(
        F.size(F.filter(F.split("text", "\n"), lambda l: F.trim(l) == "")).alias("b")
    )
    min_b = per_doc.agg(F.min("b")).first()[0]
    assert min_b == 2, min_b  # both blank lines kept in EVERY doc
    print(f"line dedup: removed {total_removed} boilerplate copies, hot line kept once, "
          f"blanks preserved  [{wall:.1f}s]")
    corpus.unpersist(); out.unpersist()
    return wall


def stress_interval_join(spark, sf_dir: str, n_intervals: int) -> float:
    """Events as points; n_intervals synthetic intervals with ONE user
    owning 50% of them. Correctness = bucket-width invariance."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    hot_user = 7
    # deterministic interval selection (hash filter, not limit): limit()
    # without an ordering may pick a DIFFERENT sample if the persisted
    # frame is evicted and recomputed between the two joins, which would
    # fire the width-invariance assert as a false alarm
    sel_mod = max(1, ev.count() // n_intervals)
    iv = (
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(sel_mod)) == 0)
        .select(
            F.col("event_id").alias("iv_id"),
            F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, F.lit(hot_user))
            .otherwise(F.pmod(F.col("event_id"), F.lit(1500)))
            .alias("user_id"),
            F.col("ts").alias("start_ts"),
            # widths 1 min .. ~5.5 h, hash-derived
            (
                F.col("ts")
                + F.make_interval(
                    secs=(F.pmod(F.xxhash64("event_id"), F.lit(20000)) + 60).cast(
                        "double"
                    )
                )
            ).alias("end_ts"),
        )
        .repartition(64)
        .persist()
    )
    n_iv = iv.count()
    n_hot = iv.filter(F.col("user_id") == hot_user).count()
    print(f"interval corpus: {n_iv} intervals, hot user owns {n_hot}")

    walls = {}
    counts = {}
    for w in (60, 3600):
        t0 = time.time()
        j = interval_join(ev, iv, bucket_seconds=w, on="user_id")
        counts[w] = j.count()
        walls[w] = time.time() - t0
        print(f"interval join w={w}s: {counts[w]} pairs  [{walls[w]:.1f}s]")
    assert counts[60] == counts[3600], counts  # bucketization meets pairs exactly once
    iv.unpersist()
    return min(walls.values())


def stress_bloom(spark, sf_dir: str, n_batch: int) -> float:
    """Both mis-sizings. Baseline truth = plain anti-join semantics
    (skip_existing); bloom must EQUAL it in exact mode regardless."""
    base = load_table(spark, sf_dir, "documents").select("doc_id")
    fan = max(1, n_batch // 5000)
    batch = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(fan - 1))))
        .select((F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"))
        .repartition(64, "doc_id")
        .persist()
    )
    nb = batch.count()

    # (a) oversized: tiny existing set, expected_items 10M — the words
    # table must stay ~n_hashes * |existing| rows, not num_bits/64
    existing_small = batch.filter(F.pmod("doc_id", F.lit(500)) == 0).persist()
    ne = existing_small.count()
    t0 = time.time()
    out_a = skip_existing_bloom(batch, existing_small, expected_items=10_000_000)
    n_a = out_a.count()
    wall_a = time.time() - t0
    truth_a = skip_existing(batch, existing_small).count()
    assert n_a == truth_a == nb - ne, (n_a, truth_a, nb, ne)
    print(f"bloom oversized (batch {nb}, existing {ne}, expected 10M): "
          f"{n_a} new  [{wall_a:.1f}s]")

    # (b) saturated: half the batch already exists, expected_items 1k —
    # the bloom answers 'maybe' for ~everything and the rescue anti-join
    # carries the load; the answer must stay exact
    existing_big = batch.filter(F.pmod("doc_id", F.lit(2)) == 0).persist()
    ne_b = existing_big.count()
    t0 = time.time()
    out_b = skip_existing_bloom(batch, existing_big, expected_items=1_000)
    n_b = out_b.count()
    wall_b = time.time() - t0
    truth_b = skip_existing(batch, existing_big).count()
    assert n_b == truth_b == nb - ne_b, (n_b, truth_b)
    print(f"bloom saturated (batch {nb}, existing {ne_b}, expected 1k): "
          f"{n_b} new  [{wall_b:.1f}s]")
    batch.unpersist(); existing_small.unpersist(); existing_big.unpersist()
    return wall_a + wall_b


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark(app_name="vlds-stress-r4", shuffle_partitions=32)

    t0 = time.time()
    w1 = stress_line_dedup(spark, sf_dir, n_docs)
    w2 = stress_interval_join(spark, sf_dir, n_intervals=50_000)
    w3 = stress_bloom(spark, sf_dir, n_batch=500_000)
    print(f"round-4 op stress total: {time.time() - t0:.1f}s "
          f"(line {w1:.1f}s, interval {w2:.1f}s, bloom {w3:.1f}s)")


if __name__ == "__main__":
    main()
