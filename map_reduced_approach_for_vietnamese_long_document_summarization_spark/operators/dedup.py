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
    """Keep one row (min id) per distinct normalized text; adds n_copies.

    NULL-text docs count as ONE distinct group (SQL DISTINCT semantics —
    window partitioning groups NULL fingerprints, and the DuckDB oracle
    replays the same rule), so duplicates among them collapse like any
    other repeated value. This differs deliberately from line_dedup /
    span_dedup, which PRESERVE each NULL/emptied doc as its own husk:
    there the doc row carries structure worth keeping; here the contract
    is one row per distinct content value, and NULL is one value."""
    w = Window.partitionBy("_fp").orderBy(id_col)
    return (
        df.withColumn("_fp", doc_fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("_fp")))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def shingles_expr(
    col: Column | str, n: int = 3, lowercase: bool = True, distinct: bool = True
) -> Column:
    """Word n-gram shingles as a JVM expression (no Python) — distinct per
    doc by default (the set-semantics the dedup family needs); pass
    ``distinct=False`` to keep multiplicity (vocab/frequency counting).

    Built with n-1 ``zip_with`` passes over shifted token arrays (each gram
    extends by the next token; the short tail zips against null and is
    filtered) — O(n * len) array work instead of the O(n * len) *slices* a
    per-index formulation costs in interpreted HOF evaluation (~20x faster
    in practice: HOF lambdas don't participate in whole-stage codegen, so
    per-element constant factors dominate). Case-folding lowers the whole
    string before tokenizing (codegen) rather than ``transform(..., lower)``
    per token (one more interpreted pass) — ``lower`` maps no codepoint to
    or from whitespace, so the token stream is identical."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokenize_ws(F.lower(c) if lowercase else c)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    out = F.filter(grams, lambda x: x.isNotNull())
    if distinct:
        out = F.array_distinct(out)
    # NULL text -> empty shingle set (not NULL): keeps size()/array-fn
    # callers safe, matching the pre-rewrite contract
    return F.coalesce(out, F.array().cast("array<string>"))


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (SplitMix64) for hash-family constants."""
    mask = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & mask
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
    return x ^ (x >> 31)


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def minhash_signature_expr(shingles: Column, n_hashes: int = 64) -> Column:
    """n_hashes-wide MinHash signature, fully JVM-side per row.

    Each shingle is hashed ONCE (xxhash64 — the expensive string hash); the
    hash family is then h_i(s) = a_i * base(s) + b_i with SplitMix64-derived
    odd multipliers, wrap-around 64-bit arithmetic (cheap long ops). This is
    ~10x cheaper than n_hashes independent string hashes at 100 TB scan
    scale (whole-stage codegen's subexpression elimination evaluates the
    shared base-hash array once across the n_hashes aggregates). Empty
    shingle sets get Long.MaxValue sentinels so they never collide with
    real content."""
    bases = F.transform(shingles, lambda s: F.xxhash64(s))

    def affine(a, b):
        return lambda x: a * x + b

    sigs = []
    for i in range(n_hashes):
        a = F.lit(_to_signed(_splitmix64(2 * i) | 1))  # odd multiplier
        b = F.lit(_to_signed(_splitmix64(2 * i + 1)))
        sigs.append(
            F.coalesce(
                F.array_min(F.transform(bases, affine(a, b))),
                F.lit(2**63 - 1),
            )
        )
    return F.array(*sigs)


def lsh_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    n_bands: int = 16,
    n_hashes: int = 64,
) -> DataFrame:
    """Exploded LSH band table: exactly (id, band_idx, band_hash) — the
    signature column is deliberately NOT carried, so the band self-join
    shuffles 3 narrow columns per (doc x band) row instead of n_bands copies
    of the 64-long signature (a ~16x band-shuffle-width cut at n_bands=16).

    Parameters are validated the same way as ``hamming_near_dup_pairs``: a
    zero-width band (n_bands > n_hashes, or rows-per-band truncating to 0)
    or a signature array SHORTER than ``n_hashes`` (e.g. 16-hash md5-twin
    signatures banded with the 64-hash default) would make ``slice`` return
    [] for the tail bands — a constant band hash putting EVERY doc in one
    bucket, i.e. a silent O(n^2) self-join. The length check runs in the
    expression (``raise_error``) because the array width is data, not a
    parameter."""
    if not (1 <= n_bands <= n_hashes) or n_hashes % n_bands != 0:
        raise ValueError(
            f"n_bands must divide n_hashes with 1 <= n_bands <= n_hashes, "
            f"got n_bands={n_bands}, n_hashes={n_hashes}"
        )
    # a NULL signature is "no signature" (e.g. a NULL-text doc upstream):
    # such rows emit no bands and so never enter any candidate bucket —
    # the pre-guard behavior. Without this filter size(NULL) = -1 under
    # ANSI-off and the short-signature raise below would fire with a
    # misleading "-1 hashes" message (round-7 ADVICE).
    df = df.filter(F.col(sig_col).isNotNull())
    raw_sig = F.col(sig_col)
    sig = F.when(F.size(raw_sig) >= n_hashes, raw_sig).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"lsh_band_table: signature array in {sig_col!r} has "
                ),
                F.size(raw_sig).cast("string"),
                F.lit(
                    f" hashes but n_hashes={n_hashes} — banding a short "
                    "signature yields empty tail bands (constant band hash "
                    "= one giant bucket = silent O(n^2) join); pass the "
                    "n_hashes the signatures were built with"
                ),
            )
        )
    )
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
    return df.select(id_col, F.explode(bands).alias("b")).select(
        id_col, "b.band_idx", "b.band_hash"
    )


def _attach_est_jaccard(pair_ids: DataFrame, df: DataFrame, id_col: str, sig_col: str) -> DataFrame:
    """(id1, id2) -> (id1, id2, est_jaccard): join each side's signature
    back once and count agreeing minhash positions."""
    sigs = df.select(id_col, sig_col)
    pairs = pair_ids.join(
        sigs.select(F.col(id_col).alias("id1"), F.col(sig_col).alias("_s1")), "id1"
    ).join(sigs.select(F.col(id_col).alias("id2"), F.col(sig_col).alias("_s2")), "id2")
    agree = F.size(F.filter(F.zip_with("_s1", "_s2", lambda a, b: a == b), lambda x: x))
    return pairs.select("id1", "id2", (agree / F.size("_s1")).alias("est_jaccard"))


def minhash_lsh_star_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    n_bands: int = 16,
    n_hashes: int = 64,
) -> DataFrame:
    """Star-edge LSH banding — the viral-cluster mitigation: each
    (band_idx, band_hash) bucket emits only (bucket-min id, member) pairs,
    O(k) rows per k-member bucket where the clique join
    (``minhash_lsh_candidates``) emits O(k^2). Measured on the skew-stress
    corpus (ten 2000-replica viral clusters, SCALE.md) at threshold 0 —
    the regime where clustering is provably identical: 13,805,902 clique
    pairs -> 106,562 star pairs (130x) with the SAME downstream connected
    components, because connecting every member to the bucket minimum
    spans exactly the clique's component.

    The trade, stated precisely: at ``threshold == 0`` (bucket equivalence
    feeding a components pass) clustering is IDENTICAL to the clique's.
    With a positive est-Jaccard threshold it is an approximation — a member
    whose agreement with the bucket REP falls under the threshold drops
    even if it would have passed against some other member (and vice
    versa); borderline-threshold pipelines that need exact pair semantics
    keep the clique join. No shuffle beyond the band table's own: the rep
    is a per-bucket window min, not a self-join."""
    exploded = lsh_band_table(df, id_col, sig_col, n_bands, n_hashes)
    w = Window.partitionBy("band_idx", "band_hash")
    starred = exploded.withColumn("_rep", F.min(id_col).over(w))
    pair_ids = (
        starred.filter(F.col(id_col) != F.col("_rep"))
        .select(F.col("_rep").alias("id1"), F.col(id_col).alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    return _attach_est_jaccard(pair_ids, df, id_col, sig_col)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    n_bands: int = 16,
    n_hashes: int = 64,
) -> DataFrame:
    """LSH banding: split the signature into n_bands, bucket-join docs that
    share any (band_idx, band_hash). Output: (id1, id2) candidate pairs with
    the estimated Jaccard (fraction of agreeing minhashes).

    The band self-join runs on ids only (``lsh_band_table``); signatures are
    joined back ONCE per pair side afterwards — callers that persist the
    (id, signature) input (``minhash_dedup_pairs`` does) pay the signature
    scan twice total, not once per band."""
    exploded = lsh_band_table(df, id_col, sig_col, n_bands, n_hashes)
    left = exploded.alias("l")
    right = exploded.alias("r")
    pair_ids = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return _attach_est_jaccard(pair_ids, df, id_col, sig_col)


def span_dedup(
    docs: DataFrame,
    span_tokens: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_key: str = "hash",
) -> DataFrame:
    """Cross-corpus exact span deduplication — the C4/RefinedWeb
    "repeated line/paragraph" pass adapted to fixed token windows (the
    structure this corpus has; swap ``chunk_fixed_tokens`` for a
    newline-splitter when documents carry real paragraphs): chunk every
    document into ``span_tokens``-token windows, keep each distinct span's
    globally FIRST occurrence (min ``(doc_id, span_idx)`` — deterministic
    under any partitioning), drop repeats, and reassemble the surviving
    spans in document order.

    Returns ``(id_col, text_col, n_spans, n_removed)``; ``text_col`` is
    ``''`` when every span of a document was seen earlier (callers filter
    or keep the husk as policy dictates).

    ``dedup_key="hash"`` (default) shuffles spans as xxhash64 longs — 8
    bytes instead of the span text; a hash collision could drop a unique
    span (~2^-64 per pair — negligible, but nonzero). ``"text"`` keys the
    window by the span string itself: exact, what the SQL oracle replays,
    heavier shuffle.

    Scale: one shuffle keyed by span (keep-first window), one shuffle back
    on the doc id for reassembly — no similarity join, no all-pairs stage.
    A boilerplate span shared by millions of docs lands on one key, but
    the per-key work is a single rank pass, not a pairwise product."""
    from .chunking import chunk_fixed_tokens

    if dedup_key == "hash":
        key = F.xxhash64("chunk")
    elif dedup_key == "text":
        key = F.col("chunk")
    else:
        raise ValueError(f"dedup_key must be 'hash' or 'text', got {dedup_key!r}")
    chunks = chunk_fixed_tokens(
        docs.select(id_col, text_col), span_tokens, text_col=text_col, id_cols=(id_col,)
    )
    w = Window.partitionBy(key).orderBy(F.col(id_col), F.col("chunk_idx"))
    ranked = chunks.withColumn("_rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("_rn") == 1,
        F.struct(F.col("chunk_idx").alias("o"), F.col("chunk").alias("t")),
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(kept_struct)), lambda s: s["t"]),
                " ",
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_spans"),
            F.count(F.when(F.col("_rn") > 1, 1)).alias("n_removed"),
        )
        .select(id_col, text_col, "n_spans", "n_removed")
    )


def unpersist_inputs(df: DataFrame) -> None:
    """Release the cached intermediates a pair-builder attached via its
    ``_persisted_inputs`` hook (minhash/simhash signatures, jaccard/
    contamination shingle tables). Call AFTER the consuming action; no-op
    for DataFrames without the hook. Note the hook rides on the exact
    returned object — it does not survive further transformations, so grab
    it (or call this) at the operator boundary."""
    for cached in getattr(df, "_persisted_inputs", []):
        cached.unpersist()


def md5_hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — bit-identical in DuckDB
    via ``('0x' || substring(md5(x),1,15))::BIGINT``. The cross-engine-
    computable hash used by the verification-twin dedup operators (xxhash64,
    the production hash, exists only in Spark)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash32(col: Column) -> Column:
    """First 32 bits of md5 as a long (DuckDB:
    ``('0x' || substring(md5(x),1,8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_md5_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-engine verification twin of ``minhash_signatures``: hash family
    h_i(s) = md5("i:" || s) first-60-bits, so a SQL oracle (DuckDB) can
    reproduce signatures bit-for-bit. Same explode + min-aggregate shape as
    the production path; n_hashes full string hashes per shingle instead of
    one, so keep it for correctness harnesses and use the xxhash64 family at
    scan scale. Docs with no shingles (< shingle_n tokens) are dropped —
    sentinel signatures would band every content-free doc together."""
    sh = df.select(id_col, F.explode(shingles_expr(text_col, shingle_n)).alias("_sh"))
    aggs = [
        F.min(md5_hash60(F.concat(F.lit(f"{i}:"), F.col("_sh")))).alias(f"_h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("minhash")
    )


def minhash_md5_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    star: bool = False,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs on the md5 twin family — the
    oracle-checkable mirror of ``minhash_dedup_pairs`` (band-bucket join and
    agreement-fraction logic shared via ``minhash_lsh_candidates``;
    ``star=True`` routes through ``minhash_lsh_star_candidates``)."""
    sigs = minhash_md5_signatures(df, text_col, id_col, n_hashes, shingle_n).persist()
    cand_fn = minhash_lsh_star_candidates if star else minhash_lsh_candidates
    cands = cand_fn(sigs, id_col, "minhash", n_bands, n_hashes)
    out = cands.select(
        "id1", "id2", F.round("est_jaccard", 6).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= threshold)
    out._persisted_inputs = [sigs]  # unpersist hook for long-lived sessions
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_n: int = 3,
    include_missing: bool = True,
) -> DataFrame:
    """MinHash signatures via explode + hash-aggregate (the scale path).

    One xxhash64 per (doc, shingle) on the exploded rows, then ``n_hashes``
    ``min(a_i * base + b_i)`` aggregates. Partial (map-side) aggregation
    means only (doc_id, 64 longs) ever shuffles; the wide-but-flat agg list
    vectorizes cleanly where the per-row nested-HOF formulation
    (``minhash_signature_expr``) blows up the expression tree at high
    n_hashes. With ``include_missing`` (the default, the one-row-per-doc
    contract) shingle-less docs get sentinel signatures via a corpus-id
    left join; callers that immediately DISCARD sentinel rows (the dedup
    pair path) pass ``False`` and skip that full-corpus join entirely."""
    sh = df.select(id_col, F.explode(shingles_expr(text_col, shingle_n)).alias("_sh"))
    base = F.xxhash64("_sh")
    aggs = []
    for i in range(n_hashes):
        a = F.lit(_to_signed(_splitmix64(2 * i) | 1))
        b = F.lit(_to_signed(_splitmix64(2 * i + 1)))
        aggs.append(F.min(a * base + b).alias(f"_h{i}"))
    sigs = sh.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("minhash")
    )
    if not include_missing:
        return sigs
    sentinel = F.array(*([F.lit(2**63 - 1)] * n_hashes))
    return (
        df.select(id_col)
        .join(sigs, id_col, "left")
        .select(id_col, F.coalesce("minhash", sentinel).alias("minhash"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    star: bool = False,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: shingle -> signature ->
    band-bucket join -> estimated-Jaccard filter. ``star=True`` emits
    per-bucket (rep, member) star edges instead of the clique — O(k) per
    viral bucket, see ``minhash_lsh_star_candidates`` for the exact
    semantics trade.

    Shingle-less (empty/NULL/short) docs are EXCLUDED before banding — their
    sentinel signatures would otherwise (a) declare every pair of
    content-free docs a perfect near-duplicate and (b) pile a quadratic
    posting list onto one band key (the same skew guard as
    ``simhash_near_dup_pairs`` and the md5 twin; content-free docs belong
    to exact dedup)."""
    # include_missing=False: the agg output already contains exactly the
    # shingled docs — the sentinel left-join would add only rows this
    # function immediately discards, at one full-corpus-id shuffle join
    sigs = minhash_signatures(
        df, text_col, id_col, n_hashes, shingle_n, include_missing=False
    )
    # the band self-join references the signature subtree twice — cache so
    # signatures aren't computed per join side. persist() is LAZY: building
    # this DataFrame stays side-effect-free (no jobs run until an action).
    # The cache entry outlives the returned DataFrame (LRU-evicted, not
    # freed on GC): long-lived sessions issuing many dedup calls should
    # unpersist via the ``persisted`` hook below or spark.catalog.clearCache().
    sigs = sigs.persist()
    cand_fn = minhash_lsh_star_candidates if star else minhash_lsh_candidates
    cands = cand_fn(sigs, id_col, "minhash", n_bands, n_hashes)
    out = cands.filter(F.col("est_jaccard") >= threshold)
    out._persisted_inputs = [sigs]  # unpersist hook for long-lived sessions
    return out


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


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_col_fn=None,
) -> DataFrame:
    """SimHash via explode + bit-vote aggregates (the scale path, same shape
    as minhash_signatures): one xxhash64 per token row, then ``bits``
    sum-of-±1 aggregates on cheap shift/mask ops — all map-side combinable —
    and a driver-built shift-or expression assembles the final long.
    Equivalent to ``simhash_expr`` (equivalence-tested); faster because the
    vote loop runs in codegen instead of interpreted HOF lambdas.

    Token-less (empty/whitespace/NULL) docs are EXCLUDED: a shared sentinel
    signature would make every pair of empty docs a 'near-duplicate' and
    pile a quadratic posting list onto one band key — content-free docs
    belong to exact dedup, not similarity banding.

    ``hash_col_fn`` swaps the per-token hash (default xxhash64) — pass
    ``md5_hash32`` with ``bits=32`` for the cross-engine verification twin
    a DuckDB oracle can replicate."""
    hash_col_fn = hash_col_fn or F.xxhash64
    toks = df.select(id_col, F.explode(tokenize_ws(text_col)).alias("_t")).select(
        id_col, hash_col_fn(F.col("_t")).alias("_h")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    votes = toks.groupBy(id_col).agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in reversed(range(bits)):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = F.shiftleft(acc, 1).bitwiseOR(bit)
    return votes.select(id_col, acc.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bits: int = 64,
    hash_col_fn=None,
    star: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the ``bits``-bit signature into 4
    equal-width keys (any pair within hamming distance 3 shares a band by
    pigeonhole; wider distances are caught with high probability), then
    verify with bit_count(xor) <= max_hamming. ``bits=32`` +
    ``hash_col_fn=md5_hash32`` gives the oracle-checkable twin.

    ``star=True`` applies the same viral-cluster mitigation as
    ``minhash_lsh_star_candidates``: each band bucket emits only
    (bucket-min, member) pairs — O(k) per k-member bucket, identical
    downstream components at ``max_hamming >= bits`` (no verify), an
    approximation under a tighter hamming cut (members verify against the
    bucket rep only)."""
    # persist: referenced by both band-join sides (see minhash_dedup_pairs's
    # note on cache lifetime; unpersist hook attached to the result)
    sigs = simhash_signatures(df, text_col, id_col, bits, hash_col_fn).persist()
    out = hamming_near_dup_pairs(
        sigs, id_col=id_col, sig_col="simhash", max_hamming=max_hamming,
        bits=bits, star=star,
    )
    out._persisted_inputs = [sigs]  # unpersist hook for long-lived sessions
    return out


def hamming_near_dup_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 8,
    bits: int = 64,
    n_bands: int = 4,
    star: bool = False,
) -> DataFrame:
    """Generic hamming-distance near-dup pairs over ANY integer signature
    column (SimHash, perceptual image hashes, audio fingerprints): band the
    ``bits``-bit value into ``n_bands`` equal keys (pigeonhole: any pair
    within hamming distance ``n_bands - 1`` shares a band), equi-join the
    buckets, verify with ``bit_count(xor)``. ``star=True`` emits only
    (bucket-min, member) pairs per bucket — O(k) per viral bucket, hamming
    verified against the rep's signature (see
    ``minhash_lsh_star_candidates`` for the semantics trade). Emits
    (id1, id2, hamming), id1 < id2."""
    if not (1 <= n_bands <= bits) or bits % n_bands != 0:
        raise ValueError(
            f"n_bands must divide bits with 1 <= n_bands <= bits, got "
            f"n_bands={n_bands}, bits={bits} (n_bands > bits would give a "
            f"zero-width band key: every row in ONE bucket, a silent n^2 join)"
        )
    band_width = bits // n_bands

    def _band_key(b: int):
        shifted = F.shiftright(F.col(sig_col), b * band_width)
        if band_width >= 64:
            # n_bands=1, bits=64: the full signature IS the band key; the
            # mask (2^64 - 1) would overflow a signed long literal anyway
            return shifted
        return shifted.bitwiseAND(F.lit((1 << band_width) - 1))

    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                _band_key(b).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select(id_col, sig_col, F.explode(bands).alias("b")).select(
        id_col, sig_col, "b.band_idx", "b.band_key"
    )
    if star:
        w = Window.partitionBy("band_idx", "band_key")
        # ONE struct-min over the bucket: lexicographic ordering makes its
        # id field the bucket minimum and its signature field that row's
        # signature — two windows would double the per-bucket aggregate
        m = F.min(F.struct(id_col, sig_col)).over(w)
        starred = exploded.withColumn("_rep", m[id_col]).withColumn(
            "_rep_sig", m[sig_col]
        )
        pairs = (
            starred.filter(F.col(id_col) != F.col("_rep"))
            .select(
                F.col("_rep").alias("id1"),
                F.col(id_col).alias("id2"),
                F.bit_count(
                    F.col(sig_col).bitwiseXOR(F.col("_rep_sig"))
                ).alias("hamming"),
            )
            .dropDuplicates(["id1", "id2"])
        )
    else:
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
                F.bit_count(
                    F.col(f"l.{sig_col}").bitwiseXOR(F.col(f"r.{sig_col}"))
                ).alias("hamming"),
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
    max_doc_freq: int | None = None,
    pair_gen: str = "grouped",
) -> DataFrame:
    """Exact n-gram Jaccard via an inverted shingle index:
    |A n B| from the shingle posting lists, |A u B| = |A| + |B| - |A n B|.

    ``max_doc_freq`` drops shingles whose posting list exceeds the cap
    (stop-shingles). Pair generation is quadratic in posting-list length,
    so on a 100 TB corpus an uncapped common shingle is THE scale hazard;
    capping makes the intersection count a (documented) lower bound —
    boilerplate shared by everything stops connecting everything. Doc
    sizes |A| are still counted pre-cap so Jaccard stays comparable.

    ``pair_gen`` picks the candidate-pair plan (identical output — pinned
    by test and oracle):

    * ``"grouped"`` (default; r14, guide §2.4): ONE ``groupBy(sh)``
      collects each posting list sorted, the doc-freq cap becomes a free
      ``size(_ids)`` filter on the aggregate, and the ≤``max_doc_freq``²/2
      in-row pairs are generated shuffle-free with posexplode + slice
      (every id pairs with the strictly-larger tail, so each unordered
      pair appears exactly once — no ``id1 < id2`` post-filter blowup).
      Replaces the selfjoin shape's separate doc-freq aggregate, the
      left-semi re-filter, and both exchanged join sides.
    * ``"selfjoin"`` — the r1-r13 inverted-index self-join, kept as the
      measured reference arm.
    """
    if pair_gen not in ("grouped", "selfjoin"):
        raise ValueError(f"unknown pair_gen {pair_gen!r}")
    sh = df.select(id_col, F.explode(shingles_expr(text_col, shingle_n)).alias("sh"))
    # referenced by sizes + the pair-generation consumer(s): cache the
    # exploded index so it computes once. persist() is lazy — constructing
    # the query runs no jobs (see minhash_dedup_pairs).
    sh = sh.persist()
    # keep the PERSISTED frame for the unpersist hook: `sh` may be rebound
    # to a derived plan below, and unpersisting that derived plan is a
    # no-op (uncacheQuery matches sameResult plans only) — the cache entry
    # would leak for the session
    persisted_sh = sh
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if pair_gen == "grouped":
        # shingles are DISTINCT per doc (shingles_expr default), so each
        # posting list holds unique ids; sorted, the slice after position
        # _p yields exactly the strictly-larger partners
        lists = sh.groupBy("sh").agg(
            F.sort_array(F.collect_list(F.col(id_col))).alias("_ids")
        ).filter(F.size("_ids") >= 2)
        if max_doc_freq is not None:
            lists = lists.filter(F.size("_ids") <= max_doc_freq)
        pairs = lists.select(
            F.posexplode("_ids").alias("_p", "id1"), F.col("_ids")
        ).select(
            "id1",
            F.explode(F.slice("_ids", F.col("_p") + 2, F.size("_ids"))).alias("id2"),
        )
        inter = pairs.groupBy("id1", "id2").agg(F.count(F.lit(1)).alias("inter"))
    else:
        if max_doc_freq is not None:
            rare = (
                sh.groupBy("sh")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") <= max_doc_freq)
                .select("sh")
            )
            sh = sh.join(rare, "sh", "left_semi")
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
    jac._persisted_inputs = [persisted_sh]  # unpersist hook (see above)
    return jac


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the rolling-hash fingerprinting used by MOSS-style plagiarism and
    near-dup detection): hash every character k-gram of the whitespace-
    normalized, lowercased text, slide a w-wide window over the hash
    sequence, keep each window's minimum, and emit the distinct selected
    hashes per document. Guarantees: any shared substring of length
    >= k + w - 1 yields a shared fingerprint; nothing shorter than k does.

    Output: ``(id_col, fingerprint long)`` — one row per distinct selected
    hash. Docs shorter than k characters produce no rows; docs with fewer
    than w k-grams contribute their single global-min window.

    Scale design: ZERO shuffle. The k-gram hash array is built per row
    (sequence + substring + md5), the w-window minimum is computed with
    w-1 shifted ``zip_with``/``least`` passes (the same shifted-array trick
    as ``shingles_expr`` — no per-index slices, no explode of gram rows),
    and ``array_distinct`` dedupes per doc before the single explode of
    selected hashes. An exploded-rows formulation would shuffle ~len(text)
    rows per doc through a window sort plus a distinct; this one ships only
    the ~n/w selected fingerprints, already unique per (doc, hash).

    ``gram_hash`` picks the k-gram hash: ``"xxhash64"`` (default — one JVM
    hash per gram, the production path; winnowing needs a ~uniform hash,
    which xxhash64 is) or ``"md5"`` (``md5_hash60`` — ~2x the cost, but a
    SQL oracle replays selection bit-for-bit; the harness twin). Selection
    logic is identical; only fingerprint values differ — which means
    fingerprints are comparable ONLY within one ``gram_hash`` choice: an
    incremental-dedup store built under one hash finds zero matches against
    fingerprints of the other (the default changed md5 -> xxhash64 in
    round 3; pin ``gram_hash="md5"`` to read pre-change stores)."""
    from ..functions.text import strip_ws

    if gram_hash == "xxhash64":
        gh = F.xxhash64
    elif gram_hash == "md5":
        gh = md5_hash60
    else:
        raise ValueError(f"gram_hash must be 'xxhash64' or 'md5', got {gram_hash!r}")
    norm = F.lower(F.regexp_replace(strip_ws(text_col), r"\s+", " "))
    base = df.select(id_col, norm.alias("_t")).filter(F.length("_t") >= k)
    n_grams = F.length("_t") - k + 1
    hashes = F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: gh(F.col("_t").substr(i + 1, F.lit(k))),
    )
    with_h = base.select(id_col, n_grams.alias("_g"), hashes.alias("_h"))
    # min over h[i..i+w-1] = elementwise least of the w shifted arrays;
    # zip_with null-pads the short tail and least() skips nulls, which is
    # exactly the clipped-frame semantics at the partition end
    mins = F.col("_h")
    for s in range(1, w):
        shifted = F.slice(F.col("_h"), s + 1, F.greatest(F.size("_h") - s, F.lit(0)))
        mins = F.zip_with(mins, shifted, lambda a, b: F.least(a, b))
    keep = F.greatest(F.col("_g") - w + 1, F.lit(1))
    selected = F.array_distinct(F.slice(mins, 1, keep))
    return with_h.select(id_col, F.explode(selected).alias("fingerprint"))


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_key: str = "hash",
    min_chars: int = 1,
) -> DataFrame:
    """Cross-corpus exact LINE deduplication — the C4/RefinedWeb rule as
    published (repeated lines keep one global copy), complementing
    ``span_dedup``'s fixed token windows for corpora with real newline
    structure (web pages, code, chat logs).

    Each document splits on ``\\n``; every non-blank line (>= ``min_chars``
    chars after trimming) keeps only its globally FIRST occurrence — min
    ``(doc_id, line_idx)``, deterministic under any partitioning — and
    repeats are dropped. Blank/short lines pass through untouched (they are
    formatting, not content, and deduping them would fuse every paragraph
    break in the corpus onto one shuffle key). Returns
    ``(id_col, text_col, n_lines, n_removed)``; text is reassembled in
    line order and may be ``''`` if every content line was seen earlier.

    ``dedup_key="hash"`` shuffles 8-byte xxhash64 line keys (collision odds
    ~2^-64/pair); ``"text"`` shuffles the line strings — exact and what the
    SQL oracle replays. Scale: one shuffle keyed by line (rank pass — a
    boilerplate line shared by millions of docs is one key with a single
    window rank, not a pairwise product), one shuffle back on the doc id;
    blank lines are salted to unique keys so formatting never hot-spots."""
    from pyspark.sql import Window

    from ..functions.text import strip_ws

    # NULL text would explode to zero rows and silently DELETE the document
    # from the output (posexplode generates nothing) — coalesce to '' so the
    # doc survives as an empty husk, span_dedup's convention
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "line_idx", "line"
        ),
    )
    content = F.length(strip_ws(F.col("line"))) >= min_chars
    if dedup_key == "hash":
        key = F.xxhash64("line")
    elif dedup_key == "text":
        key = F.col("line")
    else:
        raise ValueError(f"dedup_key must be 'hash' or 'text', got {dedup_key!r}")
    # blank lines get a per-occurrence unique key: always rank 1 (kept),
    # never a corpus-wide hot partition. The content ("c:") and blank ("b:")
    # namespaces are prefix-disjoint — without the prefixes, a content line
    # whose TEXT spells the blank salt (text-key mode) would land in a blank
    # line's partition and one of the two would wrongly drop
    part = F.when(
        content, F.concat(F.lit("c:"), key.cast("string"))
    ).otherwise(
        F.concat(F.lit("b:"), F.col(id_col), F.lit(":"), F.col("line_idx"))
    )
    w = Window.partitionBy(part).orderBy(F.col(id_col), F.col("line_idx"))
    ranked = lines.withColumn("_rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("_rn") == 1,
        F.struct(F.col("line_idx").alias("o"), F.col("line").alias("t")),
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(kept_struct)), lambda s: s["t"]),
                "\n",
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col("_rn") > 1, 1)).alias("n_removed"),
        )
        .select(id_col, text_col, "n_lines", "n_removed")
    )


def minhash_incremental_pairs(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    n_bands: int = 16,
    n_hashes: int = 64,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup detection: pairs TOUCHING a new
    batch — (new x corpus) band matches plus (new x new) self-matches —
    without re-joining the corpus against itself. The daily-curation shape:
    signatures are computed once per document and stored (they are plain
    ``(id, array<long>)`` rows — parquet them next to the corpus); each
    increment then pays one band join of batch-vs-corpus (broadcast-able
    when the batch is small) and one tiny batch self-join, instead of the
    full corpus self-join whose cost never changes.

    Inputs are SIGNATURE frames (``minhash_signatures`` /
    ``minhash_md5_signatures`` output). Shingle-less sentinel signatures
    (all Long.MaxValue — ``minhash_signatures`` emits them for NULL/empty/
    short docs) are excluded HERE on both sides, the same guard
    ``minhash_dedup_pairs`` applies: without it every content-free batch
    doc pairs with every content-free corpus doc at est_jaccard 1.0 AND
    piles a quadratic posting list on one sentinel bucket. ``corpus_sigs``
    must not contain the new ids. Output matches the full self-join
    restricted to pairs with >= 1 new endpoint: (id1, id2, est_jaccard),
    id1 < id2, est >= threshold."""
    sentinel_probe = F.size(F.filter(F.col(sig_col), lambda x: x != F.lit(2**63 - 1)))
    new_sigs = new_sigs.filter(sentinel_probe > 0)
    corpus_sigs = corpus_sigs.filter(sentinel_probe > 0)
    nb = lsh_band_table(new_sigs, id_col, sig_col, n_bands, n_hashes)
    cb = lsh_band_table(corpus_sigs, id_col, sig_col, n_bands, n_hashes)
    cross = (
        nb.alias("l")
        .join(
            cb.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash")),
        )
        .select(
            F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("id1"),
            F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("id2"),
        )
    )
    within = (
        nb.alias("l")
        .join(
            nb.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id1"), F.col(f"r.{id_col}").alias("id2"))
    )
    pair_ids = cross.unionByName(within).dropDuplicates(["id1", "id2"])
    all_sigs = new_sigs.select(id_col, sig_col).unionByName(
        corpus_sigs.select(id_col, sig_col)
    )
    out = _attach_est_jaccard(pair_ids, all_sigs, id_col, sig_col)
    return out.filter(F.col("est_jaccard") >= threshold)
