"""Deterministic dataset splitting and sampling for training-data prep.

A 100 TB training corpus needs splits and samples that are (a) reproducible
run-to-run, (b) independent of partitioning and executor count, and (c) cheap.
Spark's ``randomSplit``/``sample`` are none of these (their RNG is seeded per
partition, so a repartition reshuffles the assignment). The operators here
hash a stable id column instead: md5(salt || id) -> 60-bit integer -> uniform
r in [0,1) -> threshold. Pure Catalyst expressions, zero extra shuffle, and
the arithmetic replays bit-for-bit in other engines (the DuckDB oracles in
``plans/subqueries.py`` do exactly that).

No reference counterpart: the reference processes a fixed evaluation corpus
(MR:96-101 globs a directory); splits/sampling are part of this engine's
training-pipeline surface (BASELINE.json north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^60 — md5's first 15 hex chars as an integer land in [0, 2^60)
_HASH_SPACE = float(1 << 60)


def hash_uniform(id_col: Column | str, salt: str) -> Column:
    """Uniform r in [0,1) from md5 of the salted id — deterministic and
    partitioning-independent, unlike ``F.rand``.

    NULL ids hash as a distinct sentinel key instead of propagating NULL:
    a NULL r would silently DROP the row from every threshold-filter
    sampler (``NULL < frac`` is NULL) and deterministically dump it into
    the last split of ``assign_split`` — missing metadata deserves an
    unbiased coin like every other row. The hash itself is
    ``dedup.md5_hash60`` (the cross-engine oracle hash), not a private
    copy, so sampling and dedup cannot drift apart."""
    from .dedup import md5_hash60

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.coalesce(c.cast("string"), F.lit("\x00null"))
    return md5_hash60(F.concat(F.lit(salt + ":"), key)) / F.lit(_HASH_SPACE)


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label each row with a split name by hash-bucketing ``id_col``.

    ``weights`` maps split name -> fraction (must sum to ~1; the last split
    absorbs rounding). Default 80/10/10 train/val/test. Assignment depends
    only on (salt, id), so it is stable under repartitioning, incremental
    corpus growth, and engine changes — a document keeps its split for life,
    which is what prevents train/test leakage across pipeline reruns.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(v <= 0 for v in weights.values()):
        raise ValueError(f"split weights must be > 0, got {weights}")
    if abs(sum(weights.values()) - 1.0) > 1e-6:
        # weights over 1 silently STARVE later splits (a cumulative
        # threshold past 1.0 is unreachable — the split gets zero rows
        # forever, no error); under 1 silently inflates the last split
        raise ValueError(
            f"split weights must sum to 1, got {sum(weights.values())!r} "
            f"from {weights}"
        )
    r = hash_uniform(id_col, salt)
    names = list(weights)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        # round the cumulative threshold so float accumulation can't drift
        # from the literal an oracle (or human) would write: 0.1+0.2 must
        # threshold at exactly 0.3, not 0.30000000000000004
        cum = round(cum + weights[name], 12)
        cond, lit = r < F.lit(cum), F.lit(name)
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each stratum.

    The scalable twin of ``DataFrame.sampleBy``: same semantics, but the
    keep/drop decision is a pure function of (salt, id), so the sample is
    identical across reruns, partitionings, and engines. Used for corpus
    mixing (e.g. upsample Vietnamese, downsample English boilerplate) where
    reproducibility is a hard requirement. Filter only — no shuffle; at
    100 TB this runs at scan speed and combines with predicate pushdown.
    """
    r = hash_uniform(id_col, salt)
    s = F.col(strata_col)
    thr: Column = F.lit(float(default_fraction))
    for k, v in fractions.items():
        thr = F.when(s == F.lit(k), F.lit(float(v))).otherwise(thr)
    return df.filter(r < thr)


def epoch_upsample(
    df: DataFrame,
    strata_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "epoch",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Fractional-epoch corpus mixing: replicate each row ``epochs[stratum]``
    times in expectation — the data-mixture primitive behind published LLM
    training recipes where sources are weighted in epochs (e.g. a curated
    source at 3.4 epochs, common crawl at 0.7).

    A row with weight ``e`` is emitted ``floor(e)`` times, plus one more
    copy when ``hash_uniform(id, salt) < frac(e)`` — so weight 3.4 means
    every row appears 3 times and a deterministic 40% of rows appear a 4th
    time, while weight 0.7 keeps a deterministic 70% (downsampling and
    upsampling are the same rule). The emitted ``epoch_col`` (0-based copy
    index) distinguishes replicas, so downstream shuffles/splits that key
    on ``(id, epoch)`` keep them apart.

    Deterministic in (salt, id) — stable under reruns, repartitioning, and
    engine changes, like ``assign_split``. Scale: pure row-local
    ``explode(sequence(...))`` — zero shuffle, no join; output size is
    exactly the mixture's token budget.
    """
    for k, v in epochs.items():
        if v < 0:
            raise ValueError(f"epochs must be >= 0, got {k!r}: {v}")
    if default_epochs < 0:
        raise ValueError(f"default_epochs must be >= 0, got {default_epochs}")
    s = F.col(strata_col)
    e: Column = F.lit(float(default_epochs))
    for k, v in epochs.items():
        e = F.when(s == F.lit(k), F.lit(float(v))).otherwise(e)
    base = F.floor(e).cast("int")
    frac = e - F.floor(e)
    extra = (hash_uniform(id_col, salt) < frac).cast("int")
    n_copies = base + extra
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )


def source_quota_sample(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "quota",
    safety: float = 4.0,
) -> DataFrame:
    """Cap each source/domain at ``cap`` documents, deterministically.

    Domain capping is the corpus-curation counterweight to heavy-tailed
    crawls (one mirror farm must not become 30% of the corpus). Selection
    keeps the ``cap`` docs with the smallest md5-uniform rank per source —
    stable under repartitioning and incremental growth (a kept doc stays
    kept while its source stays over quota from the same side).

    Scale design: a bare ``row_number`` window partitioned by source would
    funnel every hot domain through one task. Instead a broadcast of the
    (tiny) per-source counts pre-filters to ranks below
    ``safety * cap / n_source`` — expected ``safety * cap`` survivors per
    source regardless of source size — and only those enter the exact
    window. With ``safety=4`` the chance a source under-fills its quota is
    Chernoff-negligible, and because the pre-filter is the same
    deterministic arithmetic on both engines, an oracle replays the result
    bit-for-bit even in that tail. Sources at or under quota bypass the
    filter entirely.
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    from pyspark.sql import Window

    r = hash_uniform(id_col, salt)
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    # null-safe join key: groupBy and Window treat NULL source as its own
    # group, but a plain equi-join would drop every NULL-source row — in a
    # crawl corpus with missing metadata that is silent data loss, not a cap
    counts = counts.select(F.col(source_col).alias("_src_key"), "_n")
    pre = (
        df.withColumn("_r", r)
        .join(
            F.broadcast(counts),
            F.col(source_col).eqNullSafe(F.col("_src_key")),
        )
        .drop("_src_key")
        .filter(
            (F.col("_n") <= cap)
            | (F.col("_r") < F.least(F.lit(1.0), F.lit(safety * cap) / F.col("_n")))
        )
    )
    w = Window.partitionBy(source_col).orderBy("_r", id_col)
    return (
        pre.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_r", "_n", "_rk")
    )


def mixture_rates(
    df: DataFrame,
    target_shares: dict[str, float],
    mass_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Per-source sampling rates that hit a TARGET mixture without
    upsampling — the "what do I keep from each source to get 60/30/10?"
    solver that precedes ``epoch_upsample`` in a data-mixture recipe.

    Given target shares (normalized internally), the achievable corpus is
    bounded by the scarcest source: ``T = min_s mass_s / share_s`` is the
    largest total mass for which every source can fill its share from
    existing data; each source then keeps ``rate_s = share_s * T / mass_s``
    of its mass (== 1 for the binding source). Returns one row per source
    in the target: (source, mass, target_share, rate, kept_mass). Sources
    outside the target dict are implicitly rate-0 (dropped); feed the rates
    to ``epoch_upsample`` (epochs=rate) or a ``hash_uniform`` filter.

    A target source ABSENT from ``df`` still gets its row (mass 0, rate 0)
    and forces ``T = 0`` — every row's ``kept_mass`` reads 0, so an
    unachievable mixture is loud in the output instead of silently
    collapsing onto the sources that do exist.

    Closed-form and deterministic — replayable in SQL. Scale: one
    map-side-combinable sum per source, a broadcast of the (n_sources-row)
    table, and a scalar min; nothing touches corpus rows."""
    if not target_shares:
        raise ValueError("target_shares must be non-empty")
    for k, v in target_shares.items():
        if v <= 0:
            raise ValueError(f"target shares must be > 0, got {k!r}: {v}")
    total_share = float(sum(target_shares.values()))
    shares = df.sparkSession.createDataFrame(
        [(k, float(v) / total_share) for k, v in target_shares.items()],
        f"{source_col} string, target_share double",
    )
    mass = df.groupBy(source_col).agg(F.sum(mass_col).alias("mass"))
    # LEFT join from shares: a target source missing from the corpus keeps
    # its row with mass 0 rather than vanishing (which would re-solve the
    # mixture over the present sources only — the caller would believe the
    # target was hit)
    # hint the BUILD side: a left-outer broadcast join can only build on
    # the right, so hinting the preserved shares side would be ignored
    joined = shares.join(F.broadcast(mass), source_col, "left").withColumn(
        "mass", F.coalesce("mass", F.lit(0).cast("long"))
    )
    # the scalar min as a whole-frame window over the (n_sources-row)
    # joined table — NOT a separate aggregate crossJoined back, whose
    # second plan branch would re-run the corpus mass aggregation when
    # exchange reuse doesn't kick in
    from pyspark.sql import Window

    joined = joined.withColumn(
        "_t",
        F.min(F.col("mass") / F.col("target_share")).over(
            Window.partitionBy(F.lit(1))
        ),
    )
    return joined.select(
        source_col,
        "mass",
        F.round("target_share", 9).alias("target_share"),
        F.when(F.col("mass") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.least(F.lit(1.0), F.col("target_share") * F.col("_t") / F.col("mass")),
                9,
            )
        )
        .alias("rate"),
        F.round(F.col("target_share") * F.col("_t"), 3).alias("kept_mass"),
    )
