"""Approximate-nearest-neighbor similarity search over embedding columns
(north-star, BASELINE.json).

* ``cosine_topk`` — brute-force baseline: broadcast the query set, stream
  the corpus, rank per query. Exact; O(|Q| * |corpus|) dot products but zero
  corpus shuffle, so it's the right tool whenever |Q| is small (the common
  "dedup this batch against the corpus" shape).
* ``random_hyperplane_lsh_topk`` — the scale path: 16-bit random-hyperplane
  (SRP) signatures bucket the corpus once; queries probe only their own
  bucket (plus optional multi-probe neighbors at hamming distance 1), then
  exact-rerank. Planes are derived from a fixed seed, so signatures are
  deterministic and reusable as a materialized column — at 100 TB the bucket
  assignment is a one-off scan and every subsequent query touches
  ~1/2^bits of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..metrics.semantic import cosine_similarity_expr


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, sim, rnk). Deterministic order
    via (sim desc, neighbor_id) tiebreak."""
    joined = F.broadcast(queries).crossJoin(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv"))
    )
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col(query_id))
    sims = joined.select(
        query_id,
        "neighbor_id",
        cosine_similarity_expr(query_vec, "_cv").alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), "neighbor_id")
    return sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_signature_expr(vec: Column | str, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Signed-random-projection signature: bit p = sign(v . plane_p) packed
    into one int. Plane weights are literal arrays (seeded numpy), dot
    products are JVM zip_with/aggregate — deterministic, no Python at scan."""
    v = F.col(vec) if isinstance(vec, str) else vec
    planes = _planes(dim, n_planes, seed)
    sig = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sig


def ivf_build_index(
    corpus: DataFrame,
    n_lists: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
    fit_sample_size: int = 100_000,
    fit_fraction: float | None = None,
):
    """IVF (inverted-file) index: k-means centroids partition the corpus into
    ``n_lists`` cells; each vector is assigned to its nearest centroid.

    Returns (assigned_df, centroids) where assigned_df adds a ``cell``
    column and centroids is a small driver-side list (n_lists x dim — a few
    KB, broadcast to queries). Train-on-a-sample, assign-everywhere: the fit
    input is bounded by ``fit_sample_size`` rows WITHOUT any pre-count
    action over the corpus. The default takes the ``fit_sample_size``
    smallest ``xxhash64(id, seed)`` values (TakeOrdered: per-partition
    top-n, driver merge of n — no shuffle) — an UNBIASED deterministic
    sample even when the corpus's physical layout is sorted/clustered,
    where a plain ``limit`` prefix would collapse the centroids onto the
    first partitions' region. It costs one full (projected) scan; when the
    caller knows the corpus scale, ``fit_fraction`` short-circuits that to
    a seeded Bernoulli ``sample`` + ``limit`` (a scan-speed filter that
    stops once enough rows arrive). Queries then touch only
    n_probe/n_lists of the data. The corpus columns ride through the
    transform — no join-back shuffle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.withColumn("features", array_to_vector(F.col(corpus_vec)))
    if fit_fraction is not None:
        train = vecs.sample(False, fit_fraction, seed).limit(fit_sample_size)
    else:
        train = vecs.orderBy(
            F.xxhash64(F.col(corpus_id), F.lit(seed)), F.col(corpus_id)
        ).limit(fit_sample_size)
    km = KMeans(k=n_lists, seed=seed, maxIter=20)
    model = km.fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cell").drop(
        "features"
    )
    return assigned, centroids


def ivf_topk(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF search: each query probes its ``n_probe`` nearest cells (centroid
    distances computed as literal-array expressions — centroids are tiny),
    exact cosine rerank inside the probed cells."""
    cent_sims = []
    for ci, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col(query_vec), lit, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cent_sims.append(F.struct(d.alias("dist"), F.lit(ci).alias("cell")))
    ranked = F.slice(F.array_sort(F.array(*cent_sims)), 1, n_probe)
    probes = F.transform(ranked, lambda s: s["cell"])
    q = queries.select(query_id, query_vec, F.explode(probes).alias("cell"))
    c = assigned.select(
        "cell", F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    )
    joined = q.join(c, "cell")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col(query_id))
    sims = joined.dropDuplicates([query_id, "neighbor_id"]).select(
        query_id, "neighbor_id", cosine_similarity_expr(query_vec, "_cv").alias("sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), "neighbor_id")
    return sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (north-star dedup family):
    SRP-bucket the vectors (multi-probe hamming-1), verify candidates with
    exact cosine >= threshold. Near-duplicates have cosine ~1, i.e. tiny
    angles, so the probability a plane separates them is theta/pi ~ 0 —
    banding recall is high exactly in the regime the operator targets.

    ``dim`` is explicit (like the other SRP operators) so building the plan
    stays lazy — deriving it from ``first()`` would run a job at
    construction time and crash on empty input."""
    sig = srp_signature_expr(vec_col, dim, n_planes)
    base = vectors.select(id_col, vec_col, sig.alias("_sig"))
    probes = F.array(
        F.col("_sig"), *[F.col("_sig").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    exploded = base.select(id_col, vec_col, F.explode(probes).alias("bucket"))
    l = exploded.alias("l")
    r = base.withColumn("bucket", F.col("_sig")).alias("r")
    cands = (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            F.col(f"l.{vec_col}").alias("_v1"),
            F.col(f"r.{vec_col}").alias("_v2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return cands.select(
        "id1", "id2", cosine_similarity_expr("_v1", "_v2").alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def random_hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    multi_probe: bool = True,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k: equi-join on SRP bucket (optionally multi-probing all
    hamming-1 neighbor buckets of the query), exact cosine rerank inside the
    candidate set. Recall < 1.0 by construction; raise n_planes for bigger
    buckets or keep multi_probe for the standard recall boost."""
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("_cv"),
        srp_signature_expr(corpus_vec, dim, n_planes).alias("bucket"),
    )
    q_sig = queries.withColumn("_sig", srp_signature_expr(query_vec, dim, n_planes))
    if multi_probe:
        probes = F.array(
            F.col("_sig"), *[F.col("_sig").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        )
    else:
        probes = F.array(F.col("_sig"))
    q = q_sig.select(query_id, query_vec, F.explode(probes).alias("bucket"))
    joined = q.join(c, "bucket")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col(query_id))
    sims = joined.dropDuplicates([query_id, "neighbor_id"]).select(
        query_id, "neighbor_id", cosine_similarity_expr(query_vec, "_cv").alias("sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), "neighbor_id")
    return sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def ivf_fixed_centroids(dim: int, n_lists: int = 8, seed: int = 7) -> list[list[float]]:
    """Seeded random coarse-quantizer centroids (no k-means fit): the
    oracle-checkable twin of ``ivf_build_index``'s learned centroids. Search
    quality is worse than k-means cells, but the SEARCH path — assignment,
    n_probe cell pruning, exact rerank — is identical and, with centroids as
    literals, fully replayable by a SQL oracle."""
    rng = np.random.default_rng(seed)
    return [list(map(float, row)) for row in rng.standard_normal((n_lists, dim))]


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin with a
    (distance, cell) sort — deterministic tiebreak on cell index), as a pure
    literal-array expression: no fit, no shuffle, scan-speed at 100 TB."""
    cs = []
    for ci, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col(corpus_vec), lit, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cs.append(F.struct(d.alias("dist"), F.lit(ci).alias("cell")))
    nearest = F.element_at(F.array_sort(F.array(*cs)), 1)["cell"]
    return corpus.withColumn("cell", nearest)


def cell_histogram(assigned: DataFrame, cell_col: str = "cell") -> DataFrame:
    """(cell, n) sizes of a coarse-quantizer assignment, biggest first — the
    one-line skew check every celled operator's docstring points at. The
    quadratic stage of ``semantic_dedup`` is n_i^2 per cell, so the top row
    here IS the cost (and memory) bound: a runaway megacell means the
    centroids under-fit the data's cluster structure — raise ``n_lists`` or
    refit. One map-side-combinable aggregate over an int column; at 100 TB
    the result is n_lists rows."""
    return assigned.groupBy(cell_col).agg(F.count(F.lit(1)).alias("n")).orderBy(
        F.desc("n"), cell_col
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    2303.09540 — the embedding-space dedup pass behind modern web-corpus
    curation): cluster the corpus with a coarse quantizer, compare pairs
    ONLY within a cluster, and drop every document whose cosine similarity
    to a lower-id document in its cluster reaches ``threshold``.

    Returns the surviving rows (all corpus columns + ``cell``). The keep
    rule is "no earlier similar doc in my cell" — order-independent (pure
    predicate, not a sequential scan), deterministic, and SQL-replayable
    with a NOT EXISTS. Like SemDeDup itself this is an approximation of
    transitive near-dup clustering: pairs straddling a cluster boundary are
    never compared (the recall/cost dial is the cluster count), and a
    survivor may have been similar only to dropped docs. For exact
    transitive semantics feed ``embedding_near_dup_pairs`` into
    ``connected_components`` instead.

    Scale: assignment is a literal-centroid expression (scan speed, no
    fit at query time — pass ``ivf_build_index(...)``'s learned centroids
    or ``ivf_fixed_centroids`` seeded ones); pair work shuffles on
    ``cell``, so the quadratic stage is n_i^2 per cluster instead of
    N^2 — with balanced clusters that is N^2/n_lists, and skewed megacells
    are visible (and salt-able) in the cell histogram.

    The within-cell cosine runs as an Arrow-batched per-cell numpy matmul
    (``applyInPandas`` over the cell groups — the BERTScore scorer's
    pattern, and SemDeDup's own formulation): each cell's vectors are
    l2-normalized once and multiplied in row strips, so peak memory is
    ``strip x n_cell`` floats, never ``n_cell^2``. The dominated mask
    compares each row only against LOWER-ID cellmates. Catalyst
    alternatives measured on the way here (per-pair zip_with/aggregate
    folds: interpreted, ~100x slower; posexplode + (cell, dim) self-join +
    hash agg: codegen but shuffles and aggregates n_pairs x dim rows —
    still ~5x slower at 2k vectors) lose because the dot product is dense
    linear algebra, exactly the case the Pandas-UDF escape hatch exists
    for. numpy's pairwise summation differs from a sequential SQL fold
    only at ~1e-14 — far inside the spacing of real cosines around any
    threshold, so the SQL oracle replays the predicate exactly.

    The cell histogram is the scale dial: size ``n_lists`` so the biggest
    cell's ``strip x n_cell`` strip fits an executor (SemDeDup uses tens of
    thousands of clusters at web scale); a runaway megacell shows up in a
    one-line ``groupBy("cell").count()`` and is fixed by raising
    ``n_lists``."""
    import numpy as np
    import pandas as pd

    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    # Precondition: corpus_id uniquely keys the corpus — domination is
    # recorded and anti-joined BY ID, so duplicate-id rows would all be
    # dropped together (the same contract repetition_stats_batch documents).
    # NULL-vector / NULL-id rows cannot be compared at all: np.stack would
    # crash the whole cell on a None, and NULL centroid distances would
    # pile every such row into cell 0 — pass them through as survivors
    # instead (consistent with the top-k family, which ranks NULL vectors
    # last rather than crashing).
    comparable = F.col(corpus_vec).isNotNull() & F.col(corpus_id).isNotNull()
    excluded = corpus.filter(~comparable)
    # persist the assignment: it feeds the pair stage AND the final
    # anti-join, and the interpreted centroid-distance folds are the single
    # most expensive per-row expression here — evaluate them once. persist()
    # is lazy (no job at construction); callers release via
    # operators.unpersist_inputs(out) after their action.
    assigned = ivf_assign(
        corpus.filter(comparable), centroids, corpus_vec=corpus_vec
    ).persist()
    slim = assigned.select(F.col(corpus_id).alias("_id"), F.col(corpus_vec).alias("_v"), "cell")

    def _dominated_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        order = pdf["_id"].to_numpy().argsort()  # domination is by id order
        ids = pdf["_id"].to_numpy()[order]
        V = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        unit = np.divide(V, nrm, out=np.zeros_like(V), where=nrm > 0)
        n = len(ids)
        dominated = np.zeros(n, dtype=bool)
        strip = 1024  # bounds peak memory at strip x n doubles
        for a in range(0, n, strip):
            b = min(a + strip, n)
            sims = unit[a:b] @ unit[:b].T  # (b-a) x b
            hit = sims >= threshold
            # only columns j < row index i count (lower-id cellmates)
            col = np.arange(b)
            row = np.arange(a, b)[:, None]
            dominated[a:b] = (hit & (col < row)).any(axis=1)
        return pd.DataFrame({"_id": ids[dominated]})

    dominated = (
        slim.groupBy("cell")
        .applyInPandas(_dominated_in_cell, schema=f"_id {dict(slim.dtypes)['_id']}")
        .withColumnRenamed("_id", corpus_id)
    )
    # plain anti-join: `dominated` is O(dropped docs) — at SemDeDup's target
    # scale that is a large fraction of the corpus, so forcing a broadcast
    # would collect it through the driver; let the optimizer pick (AQE still
    # broadcasts when the set is actually small)
    out = assigned.join(dominated, corpus_id, "left_anti")
    # non-comparable rows survive with a NULL cell (they were never binned)
    cell_type = dict(assigned.dtypes)["cell"]
    out = out.unionByName(
        excluded.withColumn("cell", F.lit(None).cast(cell_type))
    )
    out._persisted_inputs = [assigned]  # unpersist hook for long-lived sessions
    return out
