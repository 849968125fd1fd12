"""Training-data preparation queries: sequence packing + decontamination.

North-star extensions (BASELINE.json): the corpus-level operations that sit
between a deduplicated corpus and an actual training run — packing documents
into fixed-token sequences, and checking the test split for n-gram leakage
into the train split. Both oracles replay the md5 split assignment and the
shingle arithmetic bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _DUCK_TOKS, _DUCK_TOKS_LOWER, _t, query

def _duck_uniform_r(id_expr: str, salt: str) -> str:
    """md5-hash uniform r in [0,1) — MUST replay operators/sampling.py:
    hash_uniform exactly, including the NULL-id sentinel (chr(0)||'null' is
    byte-identical to Python's '\\x00null' under UTF-8 md5, verified): a
    plain ``id::VARCHAR`` would give NULL rows r = NULL and deterministically
    dump them into CASE else-branches — the split bias the sentinel exists
    to prevent. One definition for every salted-hash oracle below, so the
    fragments cannot drift from each other or from the operator."""
    key = f"coalesce({id_expr}::VARCHAR, chr(0) || 'null')"
    return (
        f"('0x' || substring(md5('{salt}:' || {key}), 1, 15))::BIGINT"
        " / 1152921504606846976.0"
    )


_DUCK_SPLIT_R = _duck_uniform_r("doc_id", "split")


@query(
    "corpus_pack_512",
    oracle=f"""
WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
                  coalesce(len({_DUCK_TOKS}), 0) AS n FROM documents),
r AS (SELECT shard, doc_id, n,
             sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n AS off
      FROM t)
SELECT CAST(shard AS INT) AS shard,
       CAST(floor(off / 512) AS INT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS sum_tokens,
       round(CAST(sum(n) AS BIGINT) / 512.0, 6) AS fill_frac
FROM r GROUP BY 1, 2
""",
)
def corpus_pack_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, offset rule (operators/packing.py): shard the
    corpus (id % 8), bin each shard's docs by starting token offset into
    512-token ranges (bins may overflow past a straddling doc — see
    pack_sequences), and report per-bin fill stats. One window + one
    aggregate, all JVM; the oracle replays the same running-sum bin
    arithmetic. corpus_pack_greedy_512 is the hard-budget twin."""
    from ..functions.text import ws_token_count
    from ..operators.packing import pack_sequences, packing_stats

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", ws_token_count("text").alias("n_tokens")
    )
    packed = pack_sequences(docs, max_tokens=512, n_shards=8)
    return packing_stats(packed, max_tokens=512).withColumn(
        "sum_tokens", F.col("sum_tokens").cast("long")
    )


@query(
    "corpus_pack_greedy_512",
    oracle=f"""
WITH RECURSIVE t AS (
  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
         coalesce(len({_DUCK_TOKS}), 0) AS n
  FROM documents),
seq AS (SELECT shard, doc_id, n,
               row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1 AS rn
        FROM t),
walk AS (
  SELECT shard, doc_id, n, rn, 0 AS gid, CAST(n AS BIGINT) AS acc
  FROM seq WHERE rn = 0
  UNION ALL
  SELECT s.shard, s.doc_id, s.n, s.rn,
         CASE WHEN w.acc > 0 AND w.acc + s.n > 512
              THEN w.gid + 1 ELSE w.gid END,
         CASE WHEN w.acc > 0 AND w.acc + s.n > 512
              THEN CAST(s.n AS BIGINT) ELSE w.acc + s.n END
  FROM walk w JOIN seq s ON s.shard = w.shard AND s.rn = w.rn + 1)
SELECT shard, doc_id, CAST(gid AS INT) AS seq_id FROM walk
""",
)
def corpus_pack_greedy_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-budget sequence packing (pack_sequences mode="greedy"): bins
    never exceed 512 tokens unless a lone document is itself oversized (then
    it sits alone) — the rule for feeding fixed-context training windows
    directly. Spark runs the JVM aggregate-fold per shard; the DuckDB
    oracle replays the identical sequential walk as a recursive CTE."""
    from ..functions.text import ws_token_count
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", ws_token_count("text").alias("n_tokens")
    )
    packed = pack_sequences(docs, max_tokens=512, n_shards=8, mode="greedy")
    return packed.select("shard", "doc_id", "seq_id")


@query(
    "doc_contamination_top20",
    oracle=f"""
WITH split AS (SELECT doc_id, text,
                      CASE WHEN {_DUCK_SPLIT_R} < 0.8 THEN 'train'
                           WHEN {_DUCK_SPLIT_R} < 0.9 THEN 'val'
                           ELSE 'test' END AS split
               FROM documents),
tok AS (SELECT doc_id, split, list_transform({_DUCK_TOKS}, x -> lower(x)) AS toks
        FROM split),
sh AS (SELECT doc_id, split,
              list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shs
       FROM tok WHERE len(toks) >= 3),
tsh AS (SELECT doc_id AS test_id, unnest(shs) AS sh FROM sh WHERE split = 'test'),
rsh0 AS (SELECT doc_id AS train_id, unnest(shs) AS sh FROM sh WHERE split = 'train'),
rare AS (SELECT sh FROM rsh0 GROUP BY sh HAVING count(*) <= 64),
rsh AS (SELECT rsh0.train_id, rsh0.sh FROM rsh0 JOIN rare USING (sh)),
sizes AS (SELECT test_id, count(*) AS test_shingles FROM tsh GROUP BY test_id),
pairs AS (SELECT test_id, train_id, count(*) AS n_common
          FROM tsh JOIN rsh USING (sh) GROUP BY 1, 2)
SELECT pairs.test_id, pairs.train_id, pairs.n_common, sizes.test_shingles,
       round(pairs.n_common * 1.0 / sizes.test_shingles, 6) AS containment
FROM pairs JOIN sizes USING (test_id)
ORDER BY containment DESC, test_id, train_id
LIMIT 20
""",
)
def doc_contamination_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check (operators/contamination.py): split the corpus
    with the deterministic md5 80/10/10 assignment, then rank test-split
    documents by 3-gram containment in train-split documents (train-side
    stop-shingle cap 64). The oracle replays split, shingling, cap, and
    containment arithmetic end-to-end."""
    from ..operators.contamination import ngram_contamination
    from ..operators.sampling import assign_split

    docs = assign_split(
        _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text"), "doc_id", salt="split"
    )
    train = docs.filter(F.col("split") == "train").select("doc_id", "text")
    test = docs.filter(F.col("split") == "test").select("doc_id", "text")
    return ngram_contamination(train, test, shingle_n=3, max_doc_freq=64, top_k=20)


@query(
    "corpus_top_bigrams",
    # r04 driver row was hash-red: DuckDB widens sum(BIGINT) to HUGEINT,
    # which pandas materializes as float64, so the driver hashed 48.0 vs
    # the engine's bigint 48 despite row-identical results. ::BIGINT keeps
    # the oracle in int64 (same guard as doc_char_entropy).
    oracle=f"""
WITH t AS (SELECT doc_id, list_transform({_DUCK_TOKS}, x -> lower(x)) AS toks
           FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS ngram
      FROM t WHERE len(toks) >= 2),
pd AS (SELECT ngram, doc_id, count(*) AS c FROM g GROUP BY 1, 2)
SELECT ngram, sum(c)::BIGINT AS n_occurrences, count(*) AS n_docs
FROM pd GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT 20
""",
)
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitters (operators/vocab.py): top-20 word bigrams by
    occurrence count with document frequency — the boilerplate/vocab
    profiling pass run before tokenizer training. Two-level aggregate
    (map-side combinable) + TakeOrderedAndProject top-k; the oracle
    replays tokenization, gram building, and both aggregation levels."""
    from ..operators.vocab import top_ngrams

    return top_ngrams(_t(spark, sf_dir, "documents", spread=True), n=2, k=20)


@query(
    "doc_epoch_upsample",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle=f"""
WITH u AS (SELECT doc_id, lang,
                  {_duck_uniform_r("doc_id", "epoch")} AS r,
                  CASE lang WHEN 'vi' THEN 2.5 WHEN 'en' THEN 0.75 ELSE 1.0 END AS w
           FROM documents),
c AS (SELECT doc_id, lang,
             floor(w)::BIGINT + CASE WHEN r < w - floor(w) THEN 1 ELSE 0 END AS n
      FROM u),
x AS (SELECT doc_id, lang, unnest(range(n)) AS epoch FROM c WHERE n > 0)
SELECT lang, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
       max(epoch)::INT AS max_epoch
FROM x GROUP BY lang
""",
)
def doc_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch data mixing (operators/sampling.py epoch_upsample):
    Vietnamese at 2.5 epochs, English at 0.75, everything else 1.0 —
    replicate/downsample deterministically (md5-hash extra-copy decision)
    and roll up emitted rows / distinct docs / max copy index per language.
    Weights are exact binary fractions so the frac-threshold comparison
    replays bit-for-bit in the oracle."""
    from ..operators.sampling import epoch_upsample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    up = epoch_upsample(docs, "lang", {"vi": 2.5, "en": 0.75}, default_epochs=1.0)
    return up.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("epoch").cast("int").alias("max_epoch"),
    )


@query(
    "doc_char_entropy",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle="""
WITH ch AS (SELECT doc_id,
                   unnest(list_transform(range(1, length(text) + 1),
                                         i -> substring(text, i, 1))) AS c
            FROM documents WHERE text IS NOT NULL AND length(text) > 0),
pc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
st AS (SELECT doc_id, sum(cnt)::BIGINT AS n, sum(cnt * log2(cnt)) AS clogc
       FROM pc GROUP BY doc_id)
SELECT d.doc_id, coalesce(st.n, 0) AS n_chars,
       round(coalesce(log2(st.n) - st.clogc / st.n, 0.0), 6) AS entropy
FROM documents d LEFT JOIN st USING (doc_id)
""",
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document (functions/textstats.py
    char_entropy_batch): the gibberish/degenerate-text quality signal.
    Uses the log2(n) - sum(c*log2(c))/n form so the only float sum runs
    over the ~|alphabet| distinct characters — small and same-magnitude,
    so round(6) is engine-stable. The oracle replays the char explode and
    both aggregation levels."""
    from ..functions.textstats import char_entropy_batch

    return char_entropy_batch(_t(spark, sf_dir, "documents", spread=True))



@query(
    "doc_tfidf_top3",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS_LOWER}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfm AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
s AS (SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * (ln((nd.n_docs + 1.0) / (dfm.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN dfm USING (term) CROSS JOIN nd),
r AS (SELECT s.*, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rnk FROM s)
SELECT doc_id, CAST(rnk AS INT) AS rank, term, CAST(tf AS BIGINT) AS tf, tfidf
FROM r WHERE rnk <= 3
""",
)
def doc_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (operators/vocab.py
    tfidf_top_terms): the per-doc salient-term extraction pass (topic
    tagging, boilerplate spotting). Smoothed sklearn-form idf; tfidf is
    rounded to 6 decimals BEFORE the per-doc window rank and ties break on
    the term, so the cut replays deterministically. The oracle rebuilds
    postings, document frequencies, N, and the ranked cut from scratch."""
    from ..operators.vocab import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@query(
    "doc_unigram_logprob",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS_LOWER}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
lm AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
tot AS (SELECT sum(c) AS t FROM lm),
per AS (SELECT tf.doc_id, sum(tf.tf) AS n,
               sum(tf.tf * (log2(tot.t) - log2(lm.c))) AS bits
        FROM tf JOIN lm USING (term) CROSS JOIN tot GROUP BY 1)
SELECT d.doc_id, CAST(coalesce(per.n, 0) AS BIGINT) AS n_tokens,
       round(coalesce(per.bits / per.n, 0.0), 6) AS bits_per_token
FROM documents d LEFT JOIN per USING (doc_id)
""",
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity quality signal (operators/vocab.py
    unigram_logprob): bits-per-token of each document under the corpus's
    own unigram LM — low = boilerplate, high = rare-token gibberish; a
    quality gate trims both tails. Float sum runs over each doc's distinct
    terms (same-magnitude addends -> round(6) engine-stable, the
    char-entropy argument). The oracle replays the LM fit and the per-doc
    scoring from scratch."""
    from ..operators.vocab import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


@query(
    "doc_feature_hash_embed",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS_LOWER}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
b AS (SELECT doc_id,
             CAST(('0x' || substring(md5(term), 1, 8))::BIGINT % 64 AS INT) AS dim,
             CAST(sum(tf) AS DOUBLE) AS w
      FROM tf GROUP BY 1, 2),
n AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM b GROUP BY 1)
SELECT b.doc_id, b.dim, round(b.w / n.nrm, 6) AS weight
FROM b JOIN n USING (doc_id)
""",
)
def doc_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document embedding (operators/features.py): terms
    hash into 64 buckets (cross-engine md5 bucket hash), weights are
    summed tfs L2-normalized per doc, emitted in the sparse (id, dim,
    weight) form the similarity family's groupBy/join consumers want.
    The squared-weight sum is integer-valued doubles (< 2^53), so the norm
    is exact in both engines and round(6) is stable. The oracle replays
    tokenization, bucketing, and normalization from scratch."""
    from ..operators.features import feature_hash_embed

    return feature_hash_embed(_t(spark, sf_dir, "documents", spread=True), dims=64)


_DUCK_VEC_SPLIT_R = _duck_uniform_r("vec_id", "split")


@query(
    "embedding_split_contamination",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle=f"""
WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                   CASE WHEN {_DUCK_VEC_SPLIT_R} < 0.8 THEN 'train'
                        WHEN {_DUCK_VEC_SPLIT_R} < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM embeddings WHERE vec_id < 2000),
v AS (SELECT vec_id, split,
             list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
      FROM v0 WHERE list_dot_product(e, e) > 0),
t AS (SELECT vec_id, u FROM v WHERE split = 'test'),
r AS (SELECT vec_id, u FROM v WHERE split = 'train')
SELECT t.vec_id AS test_id, r.vec_id AS train_id
FROM t, r
WHERE round(list_dot_product(t.u, r.u), 6) >= 0.3
""",
)
def embedding_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: the embedding-space twin of the n-gram
    containment check (doc_contamination_top20). Split the embeddings table
    with the same deterministic md5 80/10/10 assignment, then flag
    test-split vectors whose cosine against any train-split vector clears
    the threshold — paraphrase-level leakage that n-gram overlap misses.
    Scale: the test split is the small side by construction (10%) and is
    broadcast; the train side never shuffles (the same plan as
    cosine_topk's broadcast-queries design). Ids only, so float noise
    can't touch the driver's hash."""
    from ..operators.contamination import embedding_contamination
    from ..operators.sampling import assign_split

    e = _t(spark, sf_dir, "embeddings", spread=True).filter(F.col("vec_id") < 2000).select(
        "vec_id", "embedding"
    )
    split = assign_split(e, "vec_id")
    test = split.filter(F.col("split") == "test").select("vec_id", "embedding")
    train = split.filter(F.col("split") == "train").select("vec_id", "embedding")
    # the operator pre-normalizes once per vector and rounds cosines to 6
    # decimals before thresholding — the repo-wide cross-engine convention
    # (DuckDB's list_dot_product need not be the same left-to-right fold as
    # aggregate(zip_with(...)); a pair within an ulp of the threshold must
    # not flip between engines)
    return embedding_contamination(test, train, threshold=0.3)


_DUCK_QUOTA_R = _duck_uniform_r("doc_id", "quota")


@query(
    "doc_source_quota",
    # round-4 window candidate (tests/test_registry_window.py R4_PROMOTIONS)
    oracle=f"""
WITH u AS (SELECT doc_id, source, {_DUCK_QUOTA_R} AS r FROM documents),
c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
pre AS (SELECT u.doc_id, u.source, u.r FROM u
        JOIN c ON u.source IS NOT DISTINCT FROM c.source
        WHERE c.n <= 10 OR u.r < least(1.0, 40.0 / c.n)),
rk AS (SELECT doc_id, source,
              row_number() OVER (PARTITION BY source ORDER BY r, doc_id) AS k
       FROM pre)
SELECT doc_id, source FROM rk WHERE k <= 10
""",
)
def doc_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping (operators/sampling.py source_quota_sample): keep at
    most 10 docs per source by deterministic md5 rank — the heavy-tail
    counterweight every crawl-derived corpus applies. The broadcast
    count pre-filter keeps the per-source window small regardless of
    source size; the oracle replays rank, pre-filter, and window cut
    bit-for-bit (safety * cap = 40.0)."""
    from ..operators.sampling import source_quota_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return source_quota_sample(docs, cap=10)


@query(
    "corpus_mixture_rates",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
WITH shares(source, target_share) AS (
    -- ::DOUBLE: bare 0.5 literals make DECIMAL(2,1), which round() keeps
    -- and pandas materializes as object/Decimal — the same driver-hash
    -- dtype hazard that made corpus_top_bigrams red in r04
    VALUES ('src0', 0.5::DOUBLE), ('src1', 0.3::DOUBLE), ('src2', 0.2::DOUBLE)),
mass AS (SELECT source, sum(n_chars) AS mass FROM documents GROUP BY source),
j AS (SELECT s.source, CAST(coalesce(m.mass, 0) AS BIGINT) AS mass, s.target_share
      FROM shares s LEFT JOIN mass m USING (source)),
t AS (SELECT min(mass / target_share) AS t FROM j)
SELECT j.source, j.mass, round(j.target_share, 9) AS target_share,
       CASE WHEN j.mass = 0 THEN 0.0
            ELSE round(least(1.0, j.target_share * t.t / j.mass), 9) END AS rate,
       round(j.target_share * t.t, 3) AS kept_mass
FROM j, t
""",
)
def corpus_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture solver (operators/sampling.py mixture_rates): per-source
    keep rates that hit a 50/30/20 target mass mixture without upsampling —
    the achievable corpus is bounded by the binding source (min mass/share)
    and every other source downsamples to its share. Closed-form double
    arithmetic; the oracle replays sum -> min -> rate bit-for-bit. Scale:
    one map-side-combinable sum per source + a broadcast scalar — nothing
    touches corpus rows."""
    from ..operators.sampling import mixture_rates

    docs = _t(spark, sf_dir, "documents").select("source", "n_chars")
    return mixture_rates(
        docs, {"src0": 0.5, "src1": 0.3, "src2": 0.2}, mass_col="n_chars"
    )


@query(
    "doc_bloom_skip_existing",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
SELECT doc_id, source FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE n_chars % 3 = 0)
""",
)
def doc_bloom_skip_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-curation skip-if-exists via Bloom pre-filter
    (operators/pairing.py skip_existing_bloom): the curated corpus's key
    set folds into a broadcast-able bloom_filter_agg blob; incoming docs
    that test negative are guaranteed new (no false negatives) and the
    ~fpp maybe-existing sliver alone enters the exact anti-join — so the
    result EQUALS plain skip_existing (the oracle's NOT IN) while the big
    join shrinks to |existing| + fpp*|new| rows. The 100 TB path for F3
    when the key set outgrows a row broadcast."""
    from ..operators.pairing import skip_existing_bloom

    docs = _t(spark, sf_dir, "documents")
    existing = docs.filter(F.col("n_chars") % 3 == 0).select("doc_id")
    return skip_existing_bloom(
        docs.select("doc_id", "source"), existing, expected_items=100_000
    )


@query(
    "doc_text_normalize",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
WITH m AS (SELECT doc_id,
        '“Q’s”— ' || text || e'\\r\\n\\t tail' || chr(160) || 'end  ' AS t
        FROM documents),
s1 AS (SELECT doc_id, regexp_replace(t, '\\r\\n?', e'\\n', 'g') AS t FROM m),
s2 AS (SELECT doc_id, regexp_replace(t,
        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, translate(translate(t,
        '‘’‚‛', repeat(chr(39), 4)),
        '“”„‟', repeat(chr(34), 4)) AS t FROM s2),
s4 AS (SELECT doc_id, translate(t,
        '‐‑‒–—―−', '-------') AS t FROM s3),
s5 AS (SELECT doc_id, regexp_replace(t,
        '[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]',
        ' ', 'g') AS t FROM s4),
s6 AS (SELECT doc_id, regexp_replace(t, '[ \\t]+', ' ', 'g') AS t FROM s5),
s7 AS (SELECT doc_id, regexp_replace(t, ' ?\\n ?', e'\\n', 'g') AS t FROM s6),
s8 AS (SELECT doc_id, regexp_replace(t, '^\\s+|\\s+$', '', 'g') AS t FROM s7)
SELECT doc_id, length(t) AS n_len, md5(t) AS norm_md5 FROM s8
""",
)
def doc_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text canonicalization (functions/text.py normalize_text):
    CRLF unification, control-char strip, curly-quote / dash / Unicode-space
    folding, whitespace squeeze — the pre-dedup pass that makes exact dedup
    see through punctuation-codepoint mirrors. The harness corpus is plain
    ASCII, so the query wraps each doc in a messy Unicode frame first; the
    oracle replays every normalization step in RE2 and compares length +
    md5 of the result. Pure scan-side expressions — zero shuffle.

    Known cross-engine length contract: Spark F.length counts UTF-16 code
    units, DuckDB length() counts codepoints — identical for BMP text (the
    fixture contract; md5 over UTF-8 bytes is representation-independent
    regardless) but an astral codepoint (emoji, CJK-B) would diverge n_len
    by one per such char. If fixtures ever gain astral chars, switch the
    oracle to Spark's unit (length(t) + number of astral chars) or count
    codepoints on both sides."""
    from ..functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents", spread=True)
    messy = F.concat(
        F.lit("“Q’s”— "),
        F.col("text"),
        F.lit("\r\n\t tail end  "),
    )
    norm = normalize_text(messy)
    return docs.select(
        "doc_id", F.length(norm).alias("n_len"), F.md5(norm).alias("norm_md5")
    )


@query(
    "doc_line_dedup",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
WITH m AS (SELECT doc_id,
        regexp_replace(text,
            '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', e'\\\\1\\n', 'g') AS t
        FROM documents),
l AS (SELECT doc_id,
             unnest(string_split(t, chr(10))) AS line,
             generate_subscripts(string_split(t, chr(10)), 1) - 1 AS line_idx
      FROM m),
rk AS (SELECT doc_id, line, line_idx,
              -- blank test mirrors the operator's strip_ws (regex whitespace
              -- class, tabs too), not DuckDB trim() which strips spaces only
              CASE WHEN length(regexp_replace(line, '^\\s+|\\s+$', '', 'g')) >= 1 THEN
                row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx)
              ELSE 1 END AS rn
       FROM l),
re AS (SELECT doc_id,
              coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                                  ORDER BY line_idx), '') AS t,
              count(*) AS n_lines,
              count(CASE WHEN rn > 1 THEN 1 END) AS n_removed
       FROM rk GROUP BY doc_id)
SELECT doc_id, md5(t) AS text_md5,
       CAST(n_lines AS BIGINT) AS n_lines, CAST(n_removed AS BIGINT) AS n_removed
FROM re
""",
)
def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact line-level dedup (operators/dedup.py line_dedup) — the
    C4/RefinedWeb repeated-line rule: every non-blank line keeps its
    globally first (doc_id, line_idx) occurrence, repeats drop, documents
    reassemble in line order. The harness corpus is single-line, so the
    query first folds every 8 tokens into a line break (replayed by the
    oracle's RE2), then dedups with the exact text key. One line-key rank
    shuffle + one doc-id reassembly shuffle — no pairwise stage."""
    from ..operators.dedup import line_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    multiline = docs.select(
        "doc_id",
        F.regexp_replace(
            "text", r"(\S+ \S+ \S+ \S+ \S+ \S+ \S+ \S+) ", "$1\n"
        ).alias("text"),
    )
    out = line_dedup(multiline, dedup_key="text")
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_lines", "n_removed"
    )


@query(
    "events_click_in_purchase_window",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c
JOIN events p ON p.user_id = c.user_id
            AND p.event_type = 'purchase'
            AND c.ts >= p.ts - INTERVAL 30 MINUTE
            AND c.ts < p.ts
WHERE c.event_type = 'click'
""",
)
def events_click_in_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join (operators/interval.py): every click inside
    the 30-minute window BEFORE a same-user purchase — the
    attribution-window shape (asof's one-nearest sibling returns one row;
    this returns ALL containing windows). A naive range join is a nested
    loop; bucketizing by 30-minute floors turns it into one hash equi-join
    on (user_id, bucket) with each qualifying pair met exactly once. The
    oracle is the plain BETWEEN join."""
    from ..operators.interval import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    out = interval_join(
        clicks, purchases, bucket_seconds=1800, point_time="ts", on="user_id"
    )
    return out.select("user_id", "click_id", "purchase_id")


@query(
    "doc_script_ratios",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
WITH m AS (SELECT doc_id, text || ' привет мир 世界和平' AS t FROM documents),
c AS (SELECT doc_id,
             length(regexp_replace(t, '[^\\p{L}]', '', 'g')) AS n_letters,
             length(regexp_replace(t, '[^\\p{Latin}]', '', 'g')) AS n_latin,
             length(regexp_replace(t, '[^\\p{Cyrillic}]', '', 'g')) AS n_cyr,
             length(regexp_replace(t, '[^\\p{Han}]', '', 'g')) AS n_han
      FROM m)
SELECT doc_id, n_letters,
       round(CAST(n_latin AS DOUBLE) / n_letters, 6) AS latin_ratio,
       round(CAST(n_cyr AS DOUBLE) / n_letters, 6) AS cyrillic_ratio,
       round(CAST(n_han AS DOUBLE) / n_letters, 6) AS han_ratio
FROM c
""",
)
def doc_script_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script composition (functions/textstats.py script_ratios):
    per-doc Latin/Cyrillic/Han letter ratios — the pre-language-ID routing
    signal for multilingual curation. The ASCII harness corpus gets a
    deterministic Cyrillic+Han suffix so the ratios are non-trivial; the
    oracle recomputes each script class in RE2. Four scan-side
    regexp passes, zero shuffle."""
    from ..functions.textstats import script_ratios

    docs = _t(spark, sf_dir, "documents")
    s = script_ratios(F.concat(F.col("text"), F.lit(" привет мир 世界和平")))
    return docs.select(
        "doc_id",
        s["n_letters"].alias("n_letters"),
        s["latin_ratio"].alias("latin_ratio"),
        s["cyrillic_ratio"].alias("cyrillic_ratio"),
        s["han_ratio"].alias("han_ratio"),
    )


@query(
    "doc_length_iqr_outliers",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
WITH f AS (SELECT lang,
                  quantile_cont(n_chars, 0.25) AS q1,
                  quantile_cont(n_chars, 0.75) AS q3
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars,
       round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
       CAST(d.n_chars < f.q1 - 1.5 * (f.q3 - f.q1)
            OR d.n_chars > f.q3 + 1.5 * (f.q3 - f.q1) AS INT) AS is_outlier
-- null-safe, like the operator's eqNullSafe join: NULL-lang rows keep
-- their own stratum instead of being dropped by a USING equi-join
FROM documents d JOIN f ON d.lang IS NOT DISTINCT FROM f.lang
""",
)
def doc_length_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence length outliers per language (metrics/aggregate.py
    iqr_outliers): per-lang exact quartiles broadcast back onto the rows,
    flagging docs outside [q1-1.5*iqr, q3+1.5*iqr] — the robust trim a
    quality gate uses where mean±stddev is dragged by the tail it should
    catch. Exact percentile (linear interpolation) matches DuckDB
    quantile_cont bit-for-bit; no corpus sort, no full-frame window."""
    from ..metrics.aggregate import iqr_outliers

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = iqr_outliers(docs, "n_chars", by="lang")
    return out.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round("q1", 6).alias("q1"),
        F.round("q3", 6).alias("q3"),
        F.col("is_outlier").cast("int").alias("is_outlier"),
    )


@query(
    "corpus_diff_status",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
WITH old AS (SELECT doc_id,
                    md5(regexp_replace(regexp_replace(text, '\\s+', ' ', 'g'),
                                       '^ +| +$', '', 'g')) AS fp
             FROM documents WHERE doc_id % 7 <> 0),
new AS (SELECT doc_id,
               md5(regexp_replace(regexp_replace(
                     CASE WHEN doc_id % 3 = 0 THEN text || ' edited' ELSE text END,
                     '\\s+', ' ', 'g'), '^ +| +$', '', 'g')) AS fp
        FROM documents WHERE doc_id % 5 <> 0)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            -- null-safe, like the operator's eqNullSafe: two NULL
            -- fingerprints (NULL-text doc in both snapshots) are unchanged
            WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n USING (doc_id)
""",
)
def corpus_diff_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators/pairing.py corpus_diff): 'old' drops
    every 7th doc, 'new' drops every 5th and edits every 3rd — the diff
    must label each key added/removed/changed/unchanged by normalized-text
    fingerprint. One full-outer key join of scan-side fingerprints; the
    oracle replays the md5 normalization and the status CASE."""
    from ..operators.pairing import corpus_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" edited"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return corpus_diff(old, new)


def _quality_model_sql() -> tuple[str, str]:
    """(VALUES rows, intercept literal) from THE SAME
    fixed_quality_coefficients call the Spark query uses — a change to the
    seed/dims/intercept updates both sides in lockstep instead of leaving
    the oracle on a stale hardcoded literal."""
    from ..operators.classifier import fixed_quality_coefficients

    coefs, intercept = fixed_quality_coefficients(dims=64, seed=11)
    return ", ".join(f"({i}, {c!r})" for i, c in enumerate(coefs)), repr(intercept)


# ONE call: the two placeholders must come from the SAME model generation —
# two independent calls were only in lockstep by accident of determinism
_QM_COEFS, _QM_INTERCEPT = _quality_model_sql()


@query(
    "doc_quality_classifier_fixed",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS_LOWER}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
b AS (SELECT doc_id,
             CAST(('0x' || substring(md5(term), 1, 8))::BIGINT % 64 AS INT) AS dim,
             CAST(sum(tf) AS DOUBLE) AS w
      FROM tf GROUP BY 1, 2),
n AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM b GROUP BY 1),
feat AS (SELECT b.doc_id, b.dim, round(b.w / n.nrm, 6) AS weight
         FROM b JOIN n USING (doc_id)),
coef(dim, coef) AS (VALUES {{COEFS}}),
dots AS (SELECT doc_id, sum(weight * coef) AS dot
         FROM feat JOIN coef USING (dim) GROUP BY doc_id)
SELECT d.doc_id,
       round(1.0 / (1.0 + exp(-(coalesce(dots.dot, 0.0) + {{INTERCEPT}}))), 6) AS quality_prob
FROM documents d LEFT JOIN dots USING (doc_id)
""".replace("{COEFS}", _QM_COEFS).replace("{INTERCEPT}", _QM_INTERCEPT),
)
def doc_quality_classifier_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-quality-gate scoring path (operators/classifier.py
    score_quality) with SEEDED coefficients — the oracle-checkable twin of
    train_quality_classifier's learned weights, the ivf_fixed_centroids
    verification pattern: bucketing, broadcast coefficient join, grouped
    dot, sigmoid are the exact plan the trained model runs; only the
    weights differ. The oracle replays hashing, L2 normalization, the dot
    and the sigmoid with the coefficients as a VALUES table."""
    from ..operators.classifier import fixed_quality_coefficients, score_quality

    coefs, intercept = fixed_quality_coefficients(dims=64, seed=11)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = score_quality(docs, coefs, intercept)
    return out.select("doc_id", F.round("quality_prob", 6).alias("quality_prob"))
