"""Deduplication operators for large-scale training-data pipelines
(north-star, BASELINE.json): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes:

* **Exact** — md5 of normalized text, hash-groupBy. Only (hash, min_id,
  count) survive the map side; one shuffle keyed by a uniform hash, so no
  skew even on a 100 TB corpus full of boilerplate.
* **MinHash signatures** — computed *per row* with JVM higher-order
  functions (``array_min(transform(shingles, xxhash64(.., seed)))``): no
  explode, no shuffle, no Python. The only shuffle in the whole LSH pipeline
  is the band-bucket self-join, whose key (band_idx, band_hash) is uniform
  by construction.
* **SimHash** — 64-bit signature folded per row via ``aggregate`` over the
  token array (bit-vote counters), again zero-shuffle; near-dup candidates
  join on 16-bit bands and verify with ``bit_count(xor)`` hamming distance.
* **n-gram Jaccard** — exact pairwise similarity through an inverted-index
  self-join on shingles; quadratic only within a shingle's posting list, so
  it's the verify stage after LSH banding at scale, or standalone on
  bounded candidate sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize_ws
from ..functions.textstats import doc_fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct normalized text; adds n_copies."""
    w = Window.partitionBy("_fp").orderBy(id_col)
    return (
        df.withColumn("_fp", doc_fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("_fp")))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def shingles_expr(col: Column | str, n: int = 3, lowercase: bool = True) -> Column:
    """Distinct word n-gram shingles as a JVM expression (no Python)."""
    toks = tokenize_ws(col)
    if lowercase:
        toks = F.transform(toks, F.lower)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>")))


def minhash_signature_expr(shingles: Column, n_hashes: int = 64) -> Column:
    """n_hashes-wide MinHash signature, fully JVM-side per row.

    Hash family h_i(s) = xxhash64(s, i) — independent seeds via the second
    hash argument; empty shingle sets get Long.MaxValue sentinels so they
    never collide with real content."""
    sigs = [
        F.coalesce(
            F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i)))),
            F.lit(2**63 - 1),
        )
        for i in range(n_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    n_bands: int = 16,
    n_hashes: int = 64,
) -> DataFrame:
    """LSH banding: split the signature into n_bands, bucket-join docs that
    share any (band_idx, band_hash). Output: (id1, id2) candidate pairs with
    the estimated Jaccard (fraction of agreeing minhashes)."""
    sig = F.col(sig_col)
    rpb = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(F.slice(sig, b * rpb + 1, rpb), lambda x: x.cast("string")),
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = df.select(id_col, sig_col, F.explode(bands).alias("b")).select(
        id_col, sig_col, "b.band_idx", "b.band_hash"
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            F.col(f"l.{sig_col}").alias("_s1"),
            F.col(f"r.{sig_col}").alias("_s2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    agree = F.size(F.filter(F.zip_with("_s1", "_s2", lambda a, b: a == b), lambda x: x))
    return pairs.select(
        "id1", "id2", (agree / F.size("_s1")).alias("est_jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: shingle -> signature ->
    band-bucket join -> estimated-Jaccard filter."""
    sigs = df.select(
        id_col, minhash_signature_expr(shingles_expr(text_col, shingle_n), n_hashes).alias("minhash")
    )
    cands = minhash_lsh_candidates(sigs, id_col, "minhash", n_bands, n_hashes)
    return cands.filter(F.col("est_jaccard") >= threshold)


def simhash_expr(col: Column | str, bits: int = 64) -> Column:
    """SimHash fingerprint folded per row: each token votes +-1 on every bit
    of its xxhash64; the signature's bit b is 1 iff the vote sum is > 0.
    Entirely JVM-side (aggregate + transform), zero shuffle."""
    toks = tokenize_ws(col)
    zero = F.array_repeat(F.lit(0), bits)
    votes = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for b in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    # assemble MSB-first: acc = (acc << 1) | bit — stays in long without
    # overflow-triggering multiplication under ANSI mode
    return F.aggregate(
        F.reverse(votes),
        F.lit(0).cast("long"),
        lambda acc, v: F.shiftleft(acc, 1).bitwiseOR(
            F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        ),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4 x 16-bit
    keys (any pair within hamming distance 3 shares a band by pigeonhole;
    wider distances are caught with high probability), then verify with
    bit_count(xor) <= max_hamming."""
    sigs = df.select(id_col, simhash_expr(text_col).alias("simhash"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
            for b in range(4)
        ]
    )
    exploded = sigs.select(id_col, "simhash", F.explode(bands).alias("b")).select(
        id_col, "simhash", "b.band_idx", "b.band_key"
    )
    l, r = exploded.alias("l"), exploded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    top_k: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index self-join:
    |A n B| from the shingle posting lists, |A u B| = |A| + |B| - |A n B|."""
    sh = df.select(id_col, F.explode(shingles_expr(text_col, shingle_n)).alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .groupBy(F.col(f"l.{id_col}").alias("id1"), F.col(f"r.{id_col}").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed(id_col, "id1").withColumnRenamed("sz", "sz1"), "id1")
        .join(sizes.withColumnRenamed(id_col, "id2").withColumnRenamed("sz", "sz2"), "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    if threshold is not None:
        jac = jac.filter(F.col("jaccard") >= threshold)
    if top_k is not None:
        jac = jac.orderBy(F.desc("jaccard"), "id1", "id2").limit(top_k)
    return jac
