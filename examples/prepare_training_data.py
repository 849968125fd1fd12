"""End-to-end example: the training-data preparation pipeline composed from
the engine's north-star operators (BASELINE.json), on the harness corpus.

    python examples/prepare_training_data.py [sf_dir]

Stages (each one a DataFrame -> DataFrame transform; the whole chain is one
lazy plan except the dedup-cluster iteration):

  1. quality + language gate   (textstats: scan-speed Catalyst expressions)
  2. repetition + entropy gate (Gopher dup ratios; char-entropy gibberish floor)
  2b. perplexity gate          (CCNet-style bits/token under the corpus's own
                                unigram LM; trims boilerplate + gibberish tails)
  3. exact dedup               (md5 fingerprint keep-min-id)
  4. near-dedup                (SimHash pairs -> connected components ->
                                canonical doc per cluster)
  4b. semantic dedup           (SemDeDup: k-means coarse quantizer LEARNED
                                from the corpus embeddings via
                                ivf_build_index, within-cell cosine
                                domination — drops paraphrase-level dups
                                the lexical passes can't see)
  5. span dedup                (C4-style repeated-span removal across the
                                surviving corpus; drops emptied husks)
  6. PII redaction             (typed [EMAIL]/[PHONE]/[IP] tags, zero shuffle)
  7. train/val/test split      (deterministic md5 hash, leakage-stable)
  8. decontamination report    (test-split 3-gram containment in train)
  9. epoch mixing              (fractional-epoch upsampling of the train
                                split by language, deterministic)
 10. sequence packing          (hard-budget greedy bins per shard, over the
                                MIXED train stream — replicas pack too)
 11. shard sink                (one bin-ordered parquet file per shard —
                                what the trainer's data loader streams)
 12. learned quality gate      (train the DCLM-style classifier on labels
                                derived from the stage-1/2 heuristics over
                                a 30% seed sample, score the corpus, report
                                held-out rank agreement — the train->score
                                seam on real corpus data)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
    char_entropy_batch,
    language_id,
    quality_score,
    repetition_stats_batch,
    ws_token_count,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
    assign_split,
    cell_histogram,
    dedup_keep_canonical,
    epoch_upsample,
    exact_dedup,
    ivf_assign,
    ivf_build_index,
    md5_hash32,
    ngram_contamination,
    pack_sequences,
    packing_stats,
    semantic_dedup,
    simhash_near_dup_pairs,
    span_dedup,
    term_postings,
    unigram_logprob,
    unpersist_inputs,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
    redact_pii,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    load_table,
    write_training_shards,
)


def learned_quality_gate(docs, sample_mod: int = 3, dims: int = 64):
    """Stage 1-alternative: the fastText/DCLM-style LEARNED quality gate,
    trained on labels DERIVED FROM the heuristic signals over the real
    corpus (not a synthetic separable set — this is the train->score seam
    a curation team actually runs: heuristics label a seed sample, the
    classifier generalizes the judgment to the whole corpus at scan speed).

    * continuous heuristic composite: ``quality_score + entropy/8 -
      dup_token_ratio`` (the three stage-1/2 gate signals, folded so
      repetition hurts and entropy helps);
    * binary labels: composite >= corpus median;
    * deterministic ~30% training sample (xxhash64(doc_id) % 10 < 3 —
      replayable, no RNG);
    * fit ``train_quality_classifier`` (seeded pyspark.ml LR over hashed
      bag-of-words), score EVERYTHING with ``score_quality``.

    Returns ``(scored, labeled_all, sample_ids)`` so callers can check the
    held-out agreement: scored quality_prob must rank-correlate with the
    heuristic composite on docs the fit never saw. The oracle-checked twin
    (``doc_quality_classifier_fixed``) pins the scoring math; this stage
    proves the LEARNED path end-to-end on corpus data."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    rep = repetition_stats_batch(docs).select("doc_id", "dup_token_ratio")
    ent = char_entropy_batch(docs).select("doc_id", "entropy")
    q = docs.select("doc_id", quality_score("text").alias("q"))
    heur = (
        q.join(rep, "doc_id")
        .join(ent, "doc_id")
        .select(
            "doc_id",
            (F.col("q") + F.col("entropy") / 8 - F.col("dup_token_ratio")).alias(
                "heur"
            ),
        )
        # two explode-shuffle batch stats feed this, and it is consumed by
        # the quantile, the training sample, AND the caller's held-out
        # evaluation — materialize once (small: 2 cols/doc) and cut lineage
        .localCheckpoint(eager=True)
    )
    med = heur.approxQuantile("heur", [0.5], 0.0)[0]
    labeled_all = heur.withColumn("label", (F.col("heur") >= med).cast("int"))
    sample_ids = labeled_all.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(10)) < sample_mod
    ).select("doc_id", "label")
    train = docs.join(sample_ids, "doc_id")
    coef, intercept = train_quality_classifier(train, dims=dims)
    scored = score_quality(docs, coef, intercept)
    return scored, labeled_all, sample_ids.select("doc_id")


def prepare(spark, sf_dir, max_tokens=512, n_shards=8):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # 1-2: quality, language, repetition gates (pure scan-side filters)
    gated = (
        docs.withColumn("quality", quality_score("text"))
        .withColumn("lang_guess", language_id("text"))
        .filter((F.col("quality") >= 0.5) & (F.col("lang_guess") != "und"))
        .drop("quality", "lang_guess")
    )
    rep = repetition_stats_batch(gated)
    gated = gated.join(
        rep.filter((F.col("dup_token_ratio") < 0.95) & (F.col("top_token_ratio") < 0.5))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    # char-entropy floor: natural text sits ~4 bits/char; binary blobs and
    # single-char floods fall well under 2
    ent = char_entropy_batch(gated)
    gated = gated.join(
        ent.filter(F.col("entropy") >= 2.0).select("doc_id"), "doc_id", "left_semi"
    )

    # 2b: perplexity gate — bits/token under the corpus's own unigram LM.
    # Both tails are bad: far-below-corpus = template/boilerplate, far-above
    # = rare-token gibberish. Natural text sits a few bits either side of
    # the corpus mean; the fixed [2, 12] band is the CCNet-style trim
    # expressed as absolute bounds so the gate stays deterministic. The
    # operator consumes its input three times (LM rollup, scoring, id
    # list) — hand it a persisted postings frame so the gate chain above
    # replays once, materialize the (small) surviving-id list eagerly, and
    # release the cache before the pipeline continues: lifecycle owned here.
    post = term_postings(gated).persist()
    ppl = unigram_logprob(gated, postings=post)
    keep_ids = (
        ppl.filter(F.col("bits_per_token").between(2.0, 12.0))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    post.unpersist()
    gated = gated.join(keep_ids, "doc_id", "left_semi")

    # 3: exact dedup, 4: near-dedup clusters -> canonical survivors
    exact = exact_dedup(gated)
    pairs = simhash_near_dup_pairs(
        exact.select("doc_id", "text"), max_hamming=3, bits=32, hash_col_fn=md5_hash32
    )
    survivors = dedup_keep_canonical(exact, pairs)

    # 4b: semantic dedup (SemDeDup) with LEARNED centroids — fit the coarse
    # quantizer on the survivors' own embeddings (k-means over a bounded
    # sample, ivf_build_index), then drop within-cell cosine-dominated
    # docs. The lexical passes above catch byte- and shingle-level copies;
    # this catches paraphrases. The cell histogram is the skew/cost check:
    # its top row bounds the quadratic within-cell stage (see
    # tests/test_vocab_mixing_semdedup.py for the asserted bound).
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.join(
        survivors.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    _, centroids = ivf_build_index(emb, n_lists=8)
    sem = semantic_dedup(emb, centroids, threshold=0.95)
    sem_keep = (
        sem.select(F.col("vec_id").alias("doc_id")).localCheckpoint(eager=True)
    )
    # histogram the FULL assignment, not the survivors: the quadratic
    # within-cell stage runs over every member of a cell, so a megacell of
    # near-dups that collapses to a few survivors would otherwise hide
    biggest = cell_histogram(ivf_assign(emb, centroids)).first()
    unpersist_inputs(sem)  # release the cached assignment table
    # docs without an embedding row pass through (no evidence to drop on)
    emb_ids = emb.select(F.col("vec_id").alias("doc_id"))
    survivors = survivors.join(emb_ids, "doc_id", "left_anti").unionByName(
        survivors.join(sem_keep, "doc_id", "left_semi")
    )
    if biggest is not None:
        print(f"semantic dedup: biggest cell holds {biggest['n']} members")

    # 5: span-level dedup across the deduped corpus (repeated boilerplate
    # spans keep one global copy); docs whose every span was seen die here
    spanned = span_dedup(survivors, span_tokens=50)
    cleaned = spanned.filter(F.col("text") != "").select("doc_id", "text")

    # 6: PII redaction — after dedup (hashes must see raw bytes), before
    # the split (training never sees raw PII)
    cleaned = cleaned.select("doc_id", redact_pii("text").alias("text"))

    # 7: leakage-stable split
    split = assign_split(cleaned, "doc_id")

    # 8: decontamination report (containment of test docs in train docs)
    train = split.filter(F.col("split") == "train").select("doc_id", "text")
    test = split.filter(F.col("split") == "test").select("doc_id", "text")
    contamination = ngram_contamination(
        train, test, shingle_n=3, max_doc_freq=64, threshold=0.8
    )

    # 9: fractional-epoch mixing of the train split — upsample Vietnamese,
    # downsample English boilerplate; replicas carry a 0-based epoch index
    mixed = epoch_upsample(
        train.withColumn("lang_guess", language_id("text")),
        "lang_guess",
        {"vi": 2.5, "en": 0.75},
        default_epochs=1.0,
    ).drop("lang_guess")

    # 10: pack the MIXED train stream into hard-budget bins (greedy: bins
    # feed fixed-context windows directly, so they must never exceed the
    # budget). Replicas pack as independent rows under a replica-unique id.
    # The epoch index rides the HIGH bits: pack_sequences shards by
    # mix_id % n_shards, and 2^40 is divisible by any power-of-two shard
    # count, so the shard comes from doc_id — doc_id*8+epoch would make
    # shard == epoch (one giant shard of every epoch-0 copy, most shards
    # empty).
    mixed_lens = mixed.select(
        (F.col("epoch") * F.lit(1 << 40) + F.col("doc_id")).alias("mix_id"),
        ws_token_count("text").alias("n_tokens"),
    )
    packed = pack_sequences(
        mixed_lens, max_tokens=max_tokens, n_shards=n_shards, mode="greedy",
        id_col="mix_id",
    )
    bins = packing_stats(packed, max_tokens=max_tokens)

    return split, contamination, mixed, packed, bins


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="vlds-example-training-data")
    split, contamination, mixed, packed, bins = prepare(spark, sf_dir)

    # cache the shared upstream (gates + dedup + split) across the report
    # actions; one aggregate serves both bin stats
    split = split.persist()
    counts = {r["split"]: r["count"] for r in split.groupBy("split").count().collect()}
    # distinct test docs, not (test, train) pairs — one leaked doc matching
    # many train docs counts once
    flagged = contamination.select("test_id").distinct().count()
    unpersist_inputs(contamination)  # release the cached test-shingle table
    n_train = counts.get("train", 0)
    n_mixed = mixed.count()
    stats = bins.agg(
        F.count(F.lit(1)).alias("n_bins"), F.round(F.avg("fill_frac"), 4).alias("f")
    ).first()
    print(f"splits: {counts}")
    print(f"contaminated test docs (containment >= 0.8): {flagged}")
    print(f"mixture: {n_train} train docs -> {n_mixed} rows after epoch weighting")
    print(f"train bins: {stats['n_bins']}, mean fill: {stats['f']}")

    # learned quality gate: train on heuristic-derived labels over a 30%
    # seed, report held-out agreement (rank correlation with the heuristic
    # composite on docs the fit never saw)
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored, labeled_all, sample = learned_quality_gate(docs)
    held = (
        scored.join(labeled_all, "doc_id").join(sample, "doc_id", "left_anti")
    )
    ranked = held.withColumn(
        "ra", F.row_number().over(Window.orderBy("quality_prob", "doc_id"))
    ).withColumn("rb", F.row_number().over(Window.orderBy("heur", "doc_id")))
    rho = ranked.agg(F.corr("ra", "rb")).first()[0]
    means = {
        r["label"]: r["p"]
        for r in held.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    }
    print(
        f"learned gate: held-out spearman vs heuristic {rho:.3f}, "
        f"mean prob keep={means.get(1, 0):.3f} drop={means.get(0, 0):.3f}"
    )

    # 11: write the packed train stream as bin-ordered shards
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="vlds_train_shards_")
    write_training_shards(packed, out_dir, order_cols=("mix_id",))
    print(f"shards written to {out_dir}")
    split.unpersist()


if __name__ == "__main__":
    main()
