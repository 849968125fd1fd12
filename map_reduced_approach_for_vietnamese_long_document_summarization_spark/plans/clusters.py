"""Dedup-cluster, repetition, and lexical-retrieval queries.

The pair-emitting dedup family (`minhash_*`, `simhash_*`, `ngram_jaccard_*`)
stops at edges; these queries close the loop to actual corpus deduplication:
components -> canonical doc per cluster. The DuckDB oracle replays the SAME
md5-SimHash pair generation (shared CTE list, `relational._SIMHASH_MD5_PAIR_CTES`)
and then computes the component closure with a BOUNDED chain of min-label
flood layers (`_COMPONENT_CLOSURE` below) — so the iterative Spark
label-propagation loop is verified against an independent fixed-point
construction, the same way `mock_collapse_loop` pinned the collapse
convergence loop.

Why bounded layers and not a recursive CTE (the r1-r10 formulation): the
``reach`` recursive CTE enumerates every (node, reachable-label) pair —
working set sum(|component|^2), fine at the driver's sf0.01 gate but beyond
any budget at sf0.1 (VERDICT r10 item 4; the r9/r10 sweeps budget-skipped
it even at 1800s). Each flood layer is one O(|E|) join + group-by
(``lbl' = min(lbl, neighbors' lbl)``), and over a symmetric edge set the
chain converges to min(component) per node in diameter rounds — 5 at sf0.1
(`components_sf01_last.json`), so depth 8 carries margin. Convergence is
NOT assumed: an extra layer is computed and compared, and the ``comp``
clause poisons every row with DuckDB ``error()`` if the fixed point was
not reached — a too-shallow depth fails loudly, never silently verifies
wrong clusters. The flooding-equals-union-find equivalence is
property-tested in tests/test_round10_fixes.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _DUCK_TOKS, _DUCK_TOKS_LOWER, _SIMHASH_MD5_PAIR_CTES, _t, query

_FLOOD_DEPTH = 8  # observed sf0.1 diameter 5; poisoned convergence check below


def _closure_sql(depth: int = _FLOOD_DEPTH) -> str:
    """Single-statement CTE chain: symmetric edges -> `depth` min-label
    flood layers -> one extra verification layer -> poisoned `comp`.

    Every layer is AS MATERIALIZED: DuckDB 1.0 inlines plain CTEs at each
    reference site, and layer k references layer k-1 twice — un-materialized,
    the plan (and the simpairs band join behind ``edges``) would expand
    2^depth times."""
    parts = [
        "edges AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM simpairs\n"
        "          UNION ALL\n"
        "          SELECT id2 AS a, id1 AS b FROM simpairs)",
        "l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM documents)",
    ]
    for k in range(1, depth + 2):  # +1 extra layer proves the fixed point
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT id, min(lbl) AS lbl FROM ("
            f"SELECT id, lbl FROM l{k - 1} UNION ALL "
            f"SELECT e.b AS id, l.lbl FROM l{k - 1} l "
            f"JOIN edges e ON e.a = l.id) u GROUP BY id)"
        )
    # The error() must fire for EVERY consumer of comp, not just those that
    # read cluster_id: DuckDB 1.0 prunes unreferenced projection columns, so
    # the r11 formulation (error() inside a CASE on cluster_id) verified
    # nothing for e.g. `SELECT count(*) FROM comp` (ADVICE r11). Putting the
    # error inside conv's aggregate output AND gating comp's ROWS on conv.n
    # makes the check prune-proof — a WHERE predicate determines cardinality,
    # so any consumer (count(*) included) must evaluate conv.n, which
    # evaluates the CASE, which raises when the fixed point wasn't reached.
    parts.append(
        f"conv AS (SELECT CASE WHEN count(*) = 0 THEN 0 "
        f"ELSE error('components closure: flood depth {depth} "
        f"did not converge') END AS n FROM l{depth} a "
        f"JOIN l{depth + 1} b USING (id) WHERE a.lbl <> b.lbl)"
    )
    parts.append(
        f"comp AS (SELECT id AS doc_id, lbl AS cluster_id "
        f"FROM l{depth + 1} CROSS JOIN conv WHERE conv.n = 0)"
    )
    return ",\n".join(parts)


_COMPONENT_CLOSURE = _closure_sql()

_CLUSTER_ORACLE = f"""
WITH {_SIMHASH_MD5_PAIR_CTES},
{_COMPONENT_CLOSURE},
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
SELECT comp.doc_id, comp.cluster_id, sizes.cluster_size
FROM comp JOIN sizes USING (cluster_id)
"""


@query("doc_dup_clusters", oracle=_CLUSTER_ORACLE)
def doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters of the documents corpus: md5-32 SimHash pairs
    (hamming <= 6) -> connected components (min-label propagation,
    `operators/components.py`) -> (doc_id, cluster_id, cluster_size) for
    every document, singletons included. The oracle recomputes the same
    pairs in DuckDB and closes them with the bounded flood-layer chain
    (`_COMPONENT_CLOSURE`) — an independent fixed-point check of the
    iterative loop. Scale: the component state is
    (id, label) pairs only; each round is one edge-join shuffle + a
    map-side-combinable min."""
    from ..operators.components import connected_components
    from ..operators.dedup import md5_hash32, simhash_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = simhash_near_dup_pairs(docs, max_hamming=6, bits=32, hash_col_fn=md5_hash32)
    comp = connected_components(pairs, nodes=docs, id_col="doc_id")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        "doc_id", F.col("component").alias("cluster_id"), "cluster_size"
    )


@query(
    "doc_dedup_survivors",
    oracle=f"""
WITH {_SIMHASH_MD5_PAIR_CTES},
{_COMPONENT_CLOSURE}
SELECT lang, count(*) AS n_survivors
FROM comp JOIN documents USING (doc_id)
WHERE doc_id = cluster_id
GROUP BY lang
""",
)
def doc_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup deduplication: keep one canonical (min-id) doc per
    SimHash cluster via `dedup_keep_canonical`, then count survivors per
    language. This is the full training-data dedup shape: pairs -> clusters
    -> canonical filter — the payload columns only move in the final
    left-semi join."""
    from ..operators.components import dedup_keep_canonical
    from ..operators.dedup import md5_hash32, simhash_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pairs = simhash_near_dup_pairs(
        docs.select("doc_id", "text"), max_hamming=6, bits=32, hash_col_fn=md5_hash32
    )
    kept = dedup_keep_canonical(docs, pairs, id_col="doc_id")
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_survivors"))


@query(
    "doc_repetition_stats",
    oracle=f"""
WITH t AS (SELECT doc_id, list_transform({_DUCK_TOKS}, x -> lower(x)) AS toks FROM documents),
s AS (SELECT doc_id, toks, len(toks) AS n, len(list_distinct(toks)) AS nd,
             CASE WHEN len(toks) >= 2
                  THEN len(list_distinct(list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1])))
                  ELSE 0 END AS nd_bg
      FROM t),
top AS (SELECT doc_id, max(cnt) AS topc
        FROM (SELECT doc_id, tok, count(*) AS cnt
              FROM t, unnest(toks) AS u(tok) GROUP BY doc_id, tok)
        GROUP BY doc_id)
SELECT s.doc_id,
       round(CASE WHEN n > 0 THEN 1 - nd / n::DOUBLE ELSE 0 END, 6)            AS dup_token_ratio,
       round(CASE WHEN n >= 2 THEN 1 - nd_bg / (n - 1)::DOUBLE ELSE 0 END, 6)  AS dup_bigram_ratio,
       round(CASE WHEN n > 0 THEN top.topc / n::DOUBLE ELSE 0 END, 6)          AS top_token_ratio
FROM s LEFT JOIN top ON s.doc_id = top.doc_id
""",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters per document (dup-token, dup-bigram,
    top-token ratios): the standard signals for dropping boilerplate/
    templated docs from a training corpus. Uses the explode+groupBy batch
    path (`textstats.py:repetition_stats_batch`) — the top-token count as a
    codegen'd hash aggregate rather than the per-row interpreted HOF, ~10x
    at sf0.1 (the `repetition_stats` Column twin stays for composition).
    The DuckDB oracle recomputes all three ratios from first principles."""
    from ..functions.textstats import repetition_stats_batch

    docs = _t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    out = repetition_stats_batch(docs)
    return out.select(
        "doc_id",
        F.round("dup_token_ratio", 6).alias("dup_token_ratio"),
        F.round("dup_bigram_ratio", 6).alias("dup_bigram_ratio"),
        F.round("top_token_ratio", 6).alias("top_token_ratio"),
    )


@query(
    "bm25_search_top10",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS_LOWER} AS toks FROM documents),
corpus AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t WHERE len(toks) > 0),
post AS (SELECT doc_id, len(toks) AS doc_len, tok AS term, count(*) AS tf
         FROM t, unnest(toks) AS u(tok) GROUP BY 1, 2, 3),
hit AS (SELECT * FROM post WHERE term IN ('spark', 'window', 'stream')),
dfm AS (SELECT term, count(*) AS df FROM hit GROUP BY term)
SELECT doc_id,
       round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * (tf * 2.2)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * doc_len / avgdl))), 6) AS score
FROM hit JOIN dfm USING (term) CROSS JOIN corpus
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 10
""",
)
def bm25_search_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval (operators/retrieval.py): Okapi BM25 top-10 for the
    query {spark, window, stream} — the sparse twin of the embedding ANN
    family. One postings shuffle; document frequencies and corpus stats are
    broadcast scalars. The oracle recomputes idf/tf/length normalization
    from first principles."""
    from ..operators.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, ["spark", "window", "stream"], top_k=10)


@query(
    "embedding_int8_roundtrip",
    oracle="""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
s AS (SELECT vec_id, e,
             CASE WHEN list_max(list_transform(e, x -> abs(x))) > 0
                  THEN 127.0 / list_max(list_transform(e, x -> abs(x)))
                  ELSE 1.0 END AS scale
      FROM v),
q AS (SELECT vec_id, scale, e,
             list_transform(e, x -> floor(x * scale + 0.5) / scale) AS deq
      FROM s),
err AS (SELECT vec_id, scale,
               list_max(list_transform(range(1, len(e) + 1),
                        i -> abs(e[i] - deq[i]))) AS me
        FROM q)
SELECT vec_id,
       round(scale, 6) AS scale,
       round(me, 9) AS max_err,
       CAST(me * 2.0 * scale <= 1.0000001 AS INT) AS within_bound
FROM err
""",
)
def embedding_int8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding int8 quantization round-trip (functions/vectors.py): per
    vector, the symmetric scale (127/max|x|), the max reconstruction error,
    and whether it stays within the 0.5/scale bound — the storage-layer
    check run before shipping quantized embeddings to an ANN index. Pure
    array expressions; rounding is written as floor(x*scale+0.5) so the
    DuckDB oracle replays it exactly (round() half-rule differs between
    engines)."""
    from ..functions.vectors import int8_scale, quantization_error

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    scale = int8_scale("e")
    err = quantization_error("e", scale)
    return e.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.round(err, 9).alias("max_err"),
        (err * 2.0 * scale <= 1.0000001).cast("int").alias("within_bound"),
    )


def _semantic_dedup_oracle() -> str:
    from .relational import _ivf_centroids_values_sql

    return f"""
WITH cents AS (SELECT * FROM (VALUES {_ivf_centroids_values_sql()}) c(cid, w)),
base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dists AS MATERIALIZED (
  SELECT vec_id, cid,
         list_sum(list_transform(range(64), i -> (v[i+1] - w[i+1]) ** 2)) AS d
  FROM base, cents),
assign AS MATERIALIZED (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM dists) t WHERE rn = 1)
SELECT a.vec_id, a.cell
FROM assign a
WHERE NOT EXISTS (
  SELECT 1
  FROM assign a2
  JOIN base b2 ON b2.vec_id = a2.vec_id
  JOIN base b1 ON b1.vec_id = a.vec_id
  WHERE a2.cell = a.cell AND a2.vec_id < a.vec_id
    -- zero-norm guard, like the operator (zero vectors become the zero
    -- unit vector: sims 0, never dominating/dominated); without it the
    -- raw cosine is 0/0 = NaN and DuckDB's NaN-sorts-greater comparison
    -- makes 'NaN >= 0.35' TRUE
    AND sqrt(list_dot_product(b1.v, b1.v)) * sqrt(list_dot_product(b2.v, b2.v)) > 0
    AND list_dot_product(b1.v, b2.v)
          / (sqrt(list_dot_product(b1.v, b1.v)) * sqrt(list_dot_product(b2.v, b2.v)))
        >= 0.35)
"""


@query("embedding_semantic_dedup", oracle=_semantic_dedup_oracle())
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (operators/similarity.py
    semantic_dedup; round-4 window candidate, R4_PROMOTIONS): assign every
    embedding to its nearest seeded fixed centroid (the same coarse
    quantizer as embedding_ivf_fixed_top3, so assignment replays in SQL),
    compare pairs only WITHIN a cell, and drop each vector with an exact
    cosine >= 0.35 to a lower-id cellmate. Emits the survivors
    (vec_id, cell) — the oracle recomputes assignment and the NOT EXISTS
    domination predicate bit-for-bit.

    Scale: the quadratic pair stage is per-cell (N^2/n_lists for balanced
    cells), assignment is a literal-centroid scan — the SemDeDup recipe's
    exact cost model."""
    from ..operators.similarity import ivf_fixed_centroids, semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    cents = ivf_fixed_centroids(dim=64, n_lists=8, seed=7)
    out = semantic_dedup(e, cents, threshold=0.35)
    slim = out.select("vec_id", "cell")
    # carry the operator's unpersist hook across the projection (the hook
    # rides the exact returned object) so operators.unpersist_inputs(result)
    # can release the cached assignment table
    slim._persisted_inputs = getattr(out, "_persisted_inputs", [])
    return slim


_REPORT_ORACLE = r"""
WITH toks0 AS (
  SELECT doc_id, text,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') END AS toks
  FROM documents),
q AS (
  SELECT doc_id,
         coalesce(length(text), 0) AS n_chars,
         coalesce(len(toks), 0) AS n_tokens,
         round((least(1.0, length(text) / 50.0)
                + CASE WHEN len(toks) > 0
                        AND length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(toks)
                            BETWEEN 3.0 AND 12.0
                       THEN 1.0 ELSE 0.0 END
                + CASE WHEN length(regexp_replace(text, '\s+', '', 'g')) > 0
                       THEN length(regexp_replace(regexp_replace(text, '\s+', '', 'g'),
                                                  '[^\p{L}\p{N}]', '', 'g')) * 1.0
                            / length(regexp_replace(text, '\s+', '', 'g'))
                       ELSE 0.0 END
               ) / 3.0, 6) AS quality,
         md5(regexp_replace(regexp_replace(text, '\s+', ' ', 'g'),
                            '^ +| +$', '', 'g')) AS fingerprint
  FROM toks0),
h AS (
  SELECT doc_id,
    coalesce(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that'], lower(x)))), 0) AS en,
    coalesce(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], lower(x)))), 0) AS de,
    coalesce(len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','des'], lower(x)))), 0) AS fr,
    coalesce(len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un','una','que'], lower(x)))), 0) AS es,
    coalesce(len(list_filter(toks, x -> list_contains(['và','là','của','không','có','một','những','được'], lower(x)))), 0) AS vi
  FROM toks0),
lang AS (
  SELECT doc_id,
         CASE WHEN greatest(en, de, fr, es, vi) = 0 THEN 'und'
              WHEN en >= de AND en >= fr AND en >= es AND en >= vi THEN 'en'
              WHEN de >= fr AND de >= es AND de >= vi THEN 'de'
              WHEN fr >= es AND fr >= vi THEN 'fr'
              WHEN es >= vi THEN 'es'
              ELSE 'vi' END AS lang_guess
  FROM h),
ch AS (SELECT doc_id,
              unnest(list_transform(range(1, length(text) + 1),
                                    i -> substring(text, i, 1))) AS c
       FROM documents WHERE text IS NOT NULL AND length(text) > 0),
pc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
ent AS (SELECT doc_id, sum(cnt)::BIGINT AS n, sum(cnt * log2(cnt)) AS clogc
        FROM pc GROUP BY doc_id),
lower_toks AS (SELECT doc_id, list_transform(toks, x -> lower(x)) AS toks FROM toks0),
reps AS (
  SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
         CASE WHEN len(toks) >= 2
              THEN len(list_distinct(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i+1])))
              ELSE 0 END AS nd_bg
  FROM lower_toks),
topc AS (SELECT doc_id, max(cnt) AS topc
         FROM (SELECT doc_id, tok, count(*) AS cnt
               FROM lower_toks, unnest(toks) AS u(tok) GROUP BY doc_id, tok)
         GROUP BY doc_id),
tf AS (SELECT doc_id, tok AS term, count(*) AS tf
       FROM lower_toks, unnest(toks) AS u(tok) GROUP BY 1, 2),
lm AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
tot AS (SELECT sum(c) AS t FROM lm),
lp AS (SELECT tf.doc_id, sum(tf.tf) AS n,
              sum(tf.tf * (log2(tot.t) - log2(lm.c))) AS bits
       FROM tf JOIN lm USING (term) CROSS JOIN tot GROUP BY 1)
SELECT q.doc_id, q.n_chars, q.n_tokens, q.quality, lang.lang_guess, q.fingerprint,
       round(coalesce(log2(ent.n) - ent.clogc / ent.n, 0.0), 6) AS entropy,
       round(CASE WHEN reps.n > 0 THEN 1 - reps.nd / reps.n::DOUBLE ELSE 0 END, 6) AS dup_token_ratio,
       round(CASE WHEN reps.n >= 2 THEN 1 - reps.nd_bg / (reps.n - 1)::DOUBLE ELSE 0 END, 6) AS dup_bigram_ratio,
       round(CASE WHEN reps.n > 0 THEN topc.topc / reps.n::DOUBLE ELSE 0 END, 6) AS top_token_ratio,
       round(coalesce(lp.bits / lp.n, 0.0), 6) AS bits_per_token
FROM q
JOIN lang USING (doc_id)
LEFT JOIN ent USING (doc_id)
JOIN reps USING (doc_id)
LEFT JOIN topc USING (doc_id)
LEFT JOIN lp USING (doc_id)
"""


@query("doc_quality_report", oracle=_REPORT_ORACLE)
def doc_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call corpus profile (operators/report.py corpus_quality_report):
    counts, heuristic quality, language guess, fingerprint, char entropy,
    Gopher repetition ratios, and unigram-LM bits/token in one frame —
    one row per document, floats rounded to 6 for the oracle hash. The
    oracle recomputes the whole battery from first principles in one SQL
    (the per-signal oracles' arithmetic composed over shared token CTEs),
    so the COMPOSITION — not just each signal — is driver-verified;
    tests/test_report.py additionally pins the frame column-for-column
    against the individual operators."""
    from ..operators.report import corpus_quality_report

    out = corpus_quality_report(_t(spark, sf_dir, "documents", spread=True))
    sel = out.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "quality",
        "lang_guess",
        "fingerprint",
        F.round("entropy", 6).alias("entropy"),
        F.round("dup_token_ratio", 6).alias("dup_token_ratio"),
        F.round("dup_bigram_ratio", 6).alias("dup_bigram_ratio"),
        F.round("top_token_ratio", 6).alias("top_token_ratio"),
        F.round("bits_per_token", 6).alias("bits_per_token"),
    )
    # carry the report's unpersist hook across the projection (the hook
    # rides the exact returned object — see embedding_semantic_dedup)
    sel._persisted_inputs = getattr(out, "_persisted_inputs", [])
    return sel


@query(
    "doc_dedup_keep_best",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle=f"""
WITH {_SIMHASH_MD5_PAIR_CTES},
{_COMPONENT_CLOSURE},
rk AS (SELECT comp.doc_id, comp.cluster_id,
              row_number() OVER (PARTITION BY comp.cluster_id
                                 ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
       FROM comp JOIN documents d USING (doc_id))
SELECT d.doc_id, d.n_chars
FROM rk JOIN documents d USING (doc_id)
WHERE rk.rn = 1
""",
)
def doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup canonicalization (operators/components.py
    dedup_keep_best): same md5-SimHash pair graph and component closure as
    doc_dup_clusters, but each cluster keeps its LONGEST member (n_chars,
    ties to min doc_id) instead of the min-id one — the curation policy
    when near-duplicates differ in completeness (truncated mirrors must
    lose to the full copy). One extra max_by aggregate over (component,
    score) beyond keep-canonical; the oracle closes the same graph with the
    bounded flood-layer chain and replays the argmax with a window."""
    from ..operators.components import dedup_keep_best
    from ..operators.dedup import md5_hash32, simhash_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    pairs = simhash_near_dup_pairs(docs, max_hamming=6, bits=32, hash_col_fn=md5_hash32)
    best = dedup_keep_best(docs, pairs, score_col="n_chars")
    return best.select("doc_id", "n_chars")


@query(
    "hybrid_search_top10",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS_LOWER} AS toks FROM documents),
corpus AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t WHERE len(toks) > 0),
post AS (SELECT doc_id, len(toks) AS doc_len, tok AS term, count(*) AS tf
         FROM t, unnest(toks) AS u(tok) GROUP BY 1, 2, 3),
hit AS (SELECT * FROM post WHERE term IN ('spark', 'window', 'stream')),
dfm AS (SELECT term, count(*) AS df FROM hit GROUP BY term),
bm AS (SELECT doc_id,
              round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                        * (tf * 2.2)
                        / (tf + 1.2 * (1 - 0.75 + 0.75 * doc_len / avgdl))), 6) AS score
       FROM hit JOIN dfm USING (term) CROSS JOIN corpus
       GROUP BY doc_id
       ORDER BY score DESC, doc_id
       LIMIT 20),
bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bm),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
sims AS (SELECT e.vec_id AS doc_id,
                list_dot_product(q.qv, e.embedding::DOUBLE[])
                  / (sqrt(list_dot_product(q.qv, q.qv))
                     * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
                  AS sim
         FROM q, embeddings e WHERE e.vec_id <> 0),
dr AS (SELECT doc_id, rnk FROM (
         -- rank ROUNDED cosines (file convention: round before any
         -- cross-engine compare) — raw float folds need not agree at the
         -- ulp level between engines, and an ulp flip at the rank-20
         -- cutoff would change which doc enters the fusion
         SELECT doc_id, row_number() OVER (ORDER BY round(sim, 9) DESC, doc_id) AS rnk
         FROM sims) s WHERE rnk <= 20),
u AS (SELECT doc_id, 1.0 / (60 + rnk) AS c FROM bmr
      UNION ALL
      SELECT doc_id, 1.0 / (60 + rnk) AS c FROM dr),
f AS (SELECT doc_id, sum(c) AS rrf_score FROM u GROUP BY doc_id)
SELECT doc_id, round(rrf_score, 9) AS rrf_score, rnk FROM (
  SELECT doc_id, rrf_score,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rnk
  FROM f) z
WHERE rnk <= 10
""",
)
def hybrid_search_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/retrieval.py rrf_fuse): BM25 top-20 for
    {spark, window, stream} fused with cosine top-20 for the vec_id-0 query
    embedding by reciprocal-rank fusion (k0=60) — the modern sparse+dense
    search default. Rank-based fusion means no score normalization and an
    exactly-replayable oracle (only integer ranks cross the fusion). Both
    retriever legs are already driver-verified on their own
    (bm25_search_top10, embedding_knn_top3)."""
    from ..metrics.semantic import cosine_similarity_expr
    from ..operators.retrieval import bm25_topk, rrf_fuse
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bm = bm25_topk(docs, ["spark", "window", "stream"], top_k=20)
    bmr = bm.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    ).select("doc_id", "rnk")

    emb = _t(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    corpus = emb.select("vec_id", vec.alias("embedding"))
    qv = corpus.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    # dense leg ranks ROUNDED cosines (file convention) — cosine_topk ranks
    # raw floats, whose cross-engine ulp divergence could flip the rank-20
    # cutoff; same broadcast-query shape, explicit rounded rank
    sims = (
        corpus.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_similarity_expr("embedding", "qv"), 9).alias("sim"),
        )
    )
    # top-20 via sort+limit (TakeOrderedAndProject — per-partition heaps,
    # no single-partition global sort of ALL sims), then rank the 20
    # survivors with the same total order: identical rows, identical ranks,
    # and the window now runs over 20 rows instead of the whole corpus
    dense = (
        sims.orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
        )
        .select("doc_id", "rnk")
    )
    return rrf_fuse([bmr, dense], top_k=10)


@query(
    "media_ahash_near_dups",
    # round-5 window candidate (tests/test_registry_window.py R5_PROMOTIONS)
    oracle="""
WITH px AS (SELECT doc_id,
                   list_transform(range(1, length(text) + 1),
                                  i -> ord(substring(text, i, 1))) AS px,
                   length(text) AS n
            FROM documents WHERE length(text) >= 64),
m AS (SELECT doc_id, px, n, list_sum(px) * 1.0 / n AS gmean FROM px),
h AS (SELECT doc_id,
             CAST(list_sum(list_transform(range(64), j ->
               CASE WHEN list_sum(px[(j*n)//64 + 1 : ((j+1)*n)//64]) * 1.0
                         / (((j+1)*n)//64 - (j*n)//64) >= gmean
                    THEN CASE WHEN j = 63 THEN -9223372036854775808
                              ELSE (1::BIGINT << CAST(j AS INT)) END
                    ELSE 0 END)) AS BIGINT) AS ahash
      FROM m),
bands AS (SELECT doc_id, ahash, b, (ahash >> (b * 16)) & 65535 AS bk
          FROM h, unnest(range(4)) AS u(b)),
cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2,
                a.ahash AS h1, c.ahash AS h2
         FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id)
SELECT id1, id2, bit_count(xor(h1, h2)) AS hamming
FROM cand WHERE bit_count(xor(h1, h2)) <= 14
""",
)
def media_ahash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-duplicate detection (operators/multimodal.py
    media_average_hash + dedup.hamming_near_dup_pairs): the REAL aHash
    algorithm — 64-cell grid resample, mean threshold, bit pack — over each
    media row's pixel stream, then 16-bit-band bucketing with
    bit_count(xor) hamming verify. Pixels come from the codec-free
    stand-in (raw content bytes of the fake media lifted from the ASCII
    documents corpus — byte == codepoint, so the oracle replays the exact
    grid/threshold/pack/banding arithmetic from the text column); a real
    runtime passes pixel_fn=PIL-backed grayscale. Scale: hash is one
    Arrow-batched pass over the media bytes; pairing is the shared banded
    hamming join (star mode available for viral assets)."""
    from ..operators.multimodal import attach_fake_media, media_average_hash
    from ..operators.dedup import hamming_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # persist: the band join references the signature frame on both sides —
    # without this the Python hashing pass over all media bytes runs twice
    # (the simhash_near_dup_pairs convention; unpersist hook attached)
    sigs = (
        media_average_hash(attach_fake_media(docs))
        .filter(F.col("ahash").isNotNull())
        .persist()
    )
    out = hamming_near_dup_pairs(
        sigs, id_col="media_id", sig_col="ahash", max_hamming=14, bits=64
    ).select(F.col("id1"), F.col("id2"), F.col("hamming"))
    out._persisted_inputs = [sigs]
    return out


@query("doc_compression_ratio")  # rows-only: no SQL engine ships zlib
def doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document (functions/textstats.py
    compression_ratio_udf) — the redundancy proxy complementing the Gopher
    repetition ratios: templated text compresses far below natural prose.
    Rows-only like bpe_token_counts (the signal is a C library, not SQL);
    unit tests pin the monotonicity (repetitive << natural << random) and
    the NULL/empty contract."""
    from ..functions.textstats import compression_ratio_udf

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", compression_ratio_udf()("text").alias("compression_ratio")
    )
