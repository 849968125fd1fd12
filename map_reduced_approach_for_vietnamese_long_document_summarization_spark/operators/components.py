"""Connected components over near-dup pair graphs — dedup canonicalization.

Pairwise dedup (MinHash/SimHash/Jaccard in ``operators/dedup.py``) emits
*edges*; an actual deduplicated corpus needs the *components* those edges
form, so each near-dup cluster keeps exactly one canonical document — even
when A~B and B~C but A and C were never emitted as a pair. No reference
counterpart (the reference corpus is pre-curated); this is the north-star
training-data-pipeline surface (BASELINE.json).

Algorithm: iterative min-label propagation (the MapReduce classic — Kang et
al. HADI / Kiveris et al. "Connected Components in MapReduce", whose
large-star/small-star variant halves round count; plain flooding is used here
because near-dup graphs have tiny diameter — a cluster of rewrites/mirrors is
dense, so 3-5 rounds close it). Per round: one shuffle to propagate each
node's current label across edges, one map-side-combinable ``min`` aggregate,
one eager ``localCheckpoint`` to cut lineage (the same driver-loop pattern as
``collapse_until_fits``). State is exactly (node, label) pairs — 16 bytes a
node at 100 TB, never the documents themselves. Rounds are bounded by
``max_rounds``; the loop exits as soon as a round changes no label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._ckpt import persistent_rdd_ids as _persistent_rdd_ids
from ._ckpt import release_rdds as _release_rdds


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_rounds: int = 20,
    contract: bool = True,
    lazy_seed_ckpt: bool = False,
    lazy_label_ckpt: bool = False,
) -> DataFrame:
    """Return (``id_col``, ``component``) where ``component`` is the minimum
    node id in each connected component.

    ``edges`` is an undirected pair table (symmetrized internally, self-loops
    dropped). ``nodes``, when given, contributes isolated vertices (documents
    with no near-dup pair become singleton components) — pass the full corpus
    id column so the output covers every document.

    ``contract=False`` skips the star-contraction seed and floods the raw
    graph — exposed so the two plans can be measured head-to-head (the
    contraction trades one up-front join+distinct for smaller per-round
    joins; see SCALE.md for the measured crossover).

    ``lazy_seed_ckpt`` / ``lazy_label_ckpt`` mark the seed / round-0 label
    checkpoints lazy so each materializes under the job that would read it
    anyway (the contracted-edge checkpoint and round 1's convergence count)
    instead of paying its own driver job. MEASURED AND REJECTED as defaults
    (r14, plans/r14/probe_components_lazy.json, 6-round interleaved 4-arm
    A/B on doc_dup_clusters, all arms result-identical): seed-lazy +15%,
    label-lazy +6%, both +16% — an eager checkpoint hands AQE an exact-size
    ``Scan ExistingRDD`` leaf for the downstream joins, while the lazy form
    carries the whole subtree into the bigger plan and loses more to
    planning/stats than the saved driver job is worth. Kept as rerunnable
    experiment arms; the release bookkeeping is flag-insensitive (lazy
    localCheckpoints register their RDD ids at marking time).

    Lifecycle note: the returned plan reads the seed and final-label
    localCheckpoints, so each call pins TWO node-sized checkpoint RDDs for
    the session (every superseded per-round checkpoint is released as the
    loop runs — `test_checkpoint_release.py` asserts the ≤2 slope). A
    long-lived session making many calls pays 2 small RDDs per call; a
    caller that has fully materialized its derived result can reclaim them
    with ``operators._ckpt.release_rdds`` over a before/after id snapshot.
    """
    sc = edges.sparkSession.sparkContext
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(F.col("a") != F.col("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # checkpoint the edge table FIRST: vertices/labels derive from it, so
    # freezing it before any action makes the (possibly expensive) upstream
    # pair generation run exactly once, not once per derived action
    _pids0 = _persistent_rdd_ids(sc)
    sym = sym.localCheckpoint(eager=True)  # freeze upstream pair generation once
    sym_ids = _persistent_rdd_ids(sc) - _pids0
    vertices = sym.select(F.col("a").alias("id")).distinct()
    if nodes is not None:
        vertices = vertices.union(nodes.select(F.col(id_col).alias("id"))).distinct()

    # star-contraction seed (Kiveris et al.): every node collapses to
    # s(v) = min(v, min neighbor) — s(v) is in v's component, and the
    # component's global-min node m keeps s(m) = m. The loop then runs on
    # the CONTRACTED graph (distinct seed-to-seed edges): near-dup
    # components are dense (mirrors/rewrites cluster into near-cliques), so
    # contraction collapses most of the edge table up front — measured
    # ~900k edges -> ~3k on the harness SimHash graph — and every
    # propagation round joins the small table, not the raw one. The
    # contraction itself is one edge-map join + distinct, paid once.
    if contract:
        neigh_min = (
            sym.groupBy("a").agg(F.min("b").alias("mb")).withColumnRenamed("a", "id")
        )
        seeds = vertices.join(neigh_min, "id", "left").select(
            "id", F.least(F.col("id"), F.coalesce("mb", F.col("id"))).alias("s")
        )
        # reused by contraction + final compose; outlives the call (the
        # returned plan reads it), so it is not release-tracked. Eager on
        # purpose (lazy_seed_ckpt records the measured rejection — docstring)
        seeds = seeds.localCheckpoint(eager=not lazy_seed_ckpt)
        _pids_c = _persistent_rdd_ids(sc)
        # mapping a symmetric edge set through seeds yields a symmetric set
        # ((a,b) and (b,a) map to mirrored pairs), so no re-symmetrization —
        # just dedupe the collapsed multi-edges
        sym = (
            sym.join(seeds.select(F.col("id").alias("a"), F.col("s").alias("_sa")), "a")
            .join(seeds.select(F.col("id").alias("b"), F.col("s").alias("_sb")), "b")
            .select(F.col("_sa").alias("a"), F.col("_sb").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        sym = sym.localCheckpoint(eager=True)  # the loop's (small) edge table
        _release_rdds(sc, sym_ids)  # raw symmetric edges die after contraction
        sym_ids = _persistent_rdd_ids(sc) - _pids_c
        vertices = seeds.select(F.col("s").alias("id")).distinct()
    else:
        seeds = None

    # seed the contracted loop the same way: min(self, min contracted
    # neighbor) — flooding round 0 as one map-side-combinable aggregate
    neigh_min = sym.groupBy("a").agg(F.min("b").alias("mb")).withColumnRenamed("a", "id")
    _pids1 = _persistent_rdd_ids(sc)
    # eager on purpose (lazy_label_ckpt records the measured rejection —
    # docstring): the loop's round-1 plan reads these labels twice, and the
    # exact-size ExistingRDD leaf plans better than the inlined subtree
    labels = (
        vertices.join(neigh_min, "id", "left")
        .select("id", F.least(F.col("id"), F.coalesce("mb", F.col("id"))).alias("lbl"))
        .localCheckpoint(eager=not lazy_label_ckpt)
    )
    # each round's checkpoint supersedes the previous one; release the old
    # RDD as soon as the new one has materialized, so a k-round run (or a
    # long session of many runs) holds at most TWO label checkpoints plus
    # the edge table — not k of them slowly crushing executor memory
    prev_ids = _persistent_rdd_ids(sc) - _pids1

    lbl_type = dict(labels.dtypes)["lbl"]
    # semi-naive (delta) iteration: a node's label can only improve because a
    # neighbor's label improved in the previous round (or via its own label's
    # label — the jump below, which consults the FULL table), so the edge
    # join needs only the CHANGED nodes as sources. Round 1 propagates from
    # everyone (the seed is "new"); later rounds shrink with convergence.
    delta = labels
    n_changed = -1  # unknown until a round runs (max_rounds could be 0)
    for _ in range(max_rounds):
        # neighbor labels: for each edge a->b, b's (changed) label is a
        # candidate for a
        prop = sym.join(delta.withColumnRenamed("id", "b"), "b").select(
            F.col("a").alias("id"), "lbl"
        )
        merged = labels.select("id", "lbl", F.col("lbl").alias("prev")).unionByName(
            prop.withColumn("prev", F.lit(None).cast(lbl_type)), allowMissingColumns=False
        ).groupBy("id").agg(F.min("lbl").alias("lbl"), F.min("prev").alias("prev"))
        # pointer jumping (path halving): follow each node's label to ITS
        # label — flooding alone needs diameter rounds on a chain; combined
        # with halving, convergence is O(log diameter). The lookup table is
        # node-sized (same as the aggregate output), never edge-sized.
        lk = merged.select(F.col("id").alias("lbl"), F.col("lbl").alias("lbl2"))
        # lazy checkpoint + count the changed rows in ONE action: the count
        # below is the round's first action, so it both materializes the
        # checkpoint and decides convergence — no separate isEmpty job
        # snapshot BEFORE the localCheckpoint call: the RDD registers in
        # getPersistentRDDs at marking time, not at materialization
        _pids_round = _persistent_rdd_ids(sc)
        merged = (
            merged.join(lk, "lbl", "left")
            .select("id", F.coalesce("lbl2", "lbl").alias("lbl"), "prev")
            .localCheckpoint(eager=False)
        )
        changed = merged.filter(F.col("lbl") != F.col("prev"))
        n_changed = changed.count()  # materializes this round's checkpoint
        _release_rdds(sc, prev_ids)  # last round's labels are now dead
        prev_ids = _persistent_rdd_ids(sc) - _pids_round
        delta = changed.select("id", "lbl")
        labels = merged.select("id", "lbl")
        if n_changed == 0:
            break
    else:
        # max_rounds exhausted with labels still moving: downstream
        # canonical-dedup assumes label == min member id, which an
        # under-merged clustering silently violates — make it loud
        import warnings

        still = "an unknown number of" if n_changed < 0 else str(n_changed)
        warnings.warn(
            f"connected_components did not converge within max_rounds="
            f"{max_rounds} ({still} labels still changing); components "
            f"may be under-merged — raise max_rounds",
            RuntimeWarning,
            stacklevel=2,
        )

    # compose the contraction back out: every original node takes its
    # seed's component label (the seed is in the same component by
    # construction; contracted singletons label themselves)
    if seeds is not None:
        out = seeds.join(
            labels.select(F.col("id").alias("s"), "lbl"), "s", "left"
        ).select(
            F.col("id").alias(id_col),
            F.coalesce("lbl", F.col("s")).alias("component"),
        )
    else:
        out = labels.select(F.col("id").alias(id_col), F.col("lbl").alias("component"))
    # the contracted-edge checkpoint is dead once the loop exits; the seed
    # and final label checkpoints outlive the call, owned by the returned
    # DataFrame's plan
    _release_rdds(sc, sym_ids)
    return out


def connected_components_altstar(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_rounds: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    round-13 head-to-head EXPERIMENT arm against the default flooding
    implementation (VERDICT r12 item 6). MEASURED AND REJECTED as
    default — SCALE.md "Alternating large-star/small-star" records the
    interleaved quiet-box probe (examples/probe_components_altstar.py):
    flooding wins both the real sf0.1 near-dup graph (~1.5x) AND the
    adversarial 50k-node chain (~1.6x), because the per-round constant
    (two shuffled rewrites + distinct + fingerprint vs one label
    exchange) dominates while the round counts stay comparable (17 vs
    ~16). Kept as the equality-tested, rerunnable experiment arm.

    Per round, two edge-rewrites, each one groupBy-min + join + distinct:

    * large-star: for every node u, connect each STRICTLY LARGER neighbor
      to m(u) = min(Γ(u) ∪ {u}) — emits (v, m) for v > u;
    * small-star: orient edges (big, small); for every node u, connect its
      smaller neighbors AND u itself to their minimum.

    Both preserve connectivity and never raise a node's reachable min; at
    the fixpoint the edge set is a star from each component's minimum node.
    Convergence is O(log n) rounds on ANY graph shape (the provable-bound
    arm), where flooding+path-halving is O(log d) on diameter d — so this
    variant can only win on graphs whose diameter stays large after star
    contraction; near-dup graphs are dense and tiny-diameter, which is why
    flooding is the default. Fixpoint detection compares an order-free edge
    fingerprint (count + sum of per-edge hashes) between rounds — one
    map-side-combinable aggregate per round, no edge-set self-join.

    Same output contract as ``connected_components``: (id_col, component)
    with component = min node id; ``nodes`` contributes singletons. Pass
    ``stats`` to receive {"rounds": n}.
    """
    sc = edges.sparkSession.sparkContext
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    _pids0 = _persistent_rdd_ids(sc)
    cur = e.distinct().localCheckpoint(eager=True)
    prev_ids = _persistent_rdd_ids(sc) - _pids0

    def _fingerprint(d: DataFrame) -> tuple:
        row = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _large_star(d: DataFrame) -> DataFrame:
        sym = d.union(d.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        return (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(d: DataFrame) -> DataFrame:
        # orient (big, small): large-star output is already (v, m) with
        # m < v, but re-orient defensively so the op is standalone-correct
        o = d.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).filter(F.col("a") != F.col("b"))
        m = o.groupBy("a").agg(F.min("b").alias("m"))  # all b < a, so min(Γ⁻)
        joined = o.join(m, "a")
        # connect each smaller neighbor to the min, and u itself to the min
        out = joined.select(F.col("b").alias("a"), F.col("m").alias("b")).union(
            joined.select(F.col("a").alias("a"), F.col("m").alias("b"))
        )
        return out.filter(F.col("a") != F.col("b")).distinct()

    fp = _fingerprint(cur)
    rounds = 0
    for _ in range(max_rounds):
        _pids_round = _persistent_rdd_ids(sc)
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        nfp = _fingerprint(nxt)  # materializes the round's checkpoint
        _release_rdds(sc, prev_ids)
        prev_ids = _persistent_rdd_ids(sc) - _pids_round
        cur = nxt
        rounds += 1
        if nfp == fp:
            break
        fp = nfp
    else:
        import warnings

        warnings.warn(
            f"connected_components_altstar did not converge within "
            f"max_rounds={max_rounds}; components may be under-merged",
            RuntimeWarning,
            stacklevel=2,
        )
    if stats is not None:
        stats["rounds"] = rounds

    # at fixpoint cur is (member, root) star edges; roots/isolated nodes
    # label themselves. Members come from CUR (the checkpointed fixpoint —
    # star rewrites never drop a node of a >=2-node component), not from
    # the raw `e` plan: reading `e` here would re-run the upstream pair
    # generation a second time, and a non-deterministic upstream could
    # hand back a different node set than the one the labels were
    # computed on.
    labels = cur.select(
        F.greatest("a", "b").alias("id"), F.least("a", "b").alias("component")
    ).groupBy("id").agg(F.min("component").alias("component"))
    members = cur.select(F.col("a").alias("id")).union(
        cur.select(F.col("b").alias("id"))
    )
    if nodes is not None:
        members = members.union(nodes.select(F.col(id_col).alias("id")))
    out = (
        members.distinct()
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", F.col("id")).alias("component"),
        )
    )
    return out


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Deduplicate ``docs`` against a near-dup pair table keeping the
    BEST-scoring member of every cluster (ties broken by minimum id), not
    the minimum-id one — the curation policy when near-duplicates differ in
    quality (keep the longest / highest-quality variant, drop truncated
    mirrors). ``dedup_keep_canonical`` is the min-id special case.

    Scale: identical shape to keep-canonical — the component iteration
    carries (id, label) only; scores join in AFTER clustering, and the
    per-cluster argmax is one map-side-combinable ``max_by`` aggregate
    keyed by the component label."""
    from pyspark.sql import Window

    comp = connected_components(pairs, src=src, dst=dst, nodes=docs, id_col=id_col)
    scored = comp.join(docs.select(id_col, score_col), id_col)
    # row_number over (score desc, id asc): deterministic under ties for ANY
    # id type — the max_by(struct(score, -id)) formulation only works for
    # numeric ids (negating a string id yields NULL with ANSI off, quietly
    # degrading the tie-break to arbitrary, or a cast error with ANSI on)
    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return docs.join(best.select(id_col), id_col, "left_semi")


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Deduplicate ``docs`` against a near-dup pair table: cluster the pairs,
    keep the minimum-id document of every component (singletons keep
    themselves). The survivors join is on the node-id label table — the
    documents' payload columns never enter the component iteration.

    The kept id is the minimum member PRESENT IN ``docs``: a pair table may
    reference ids outside the corpus (computed on a superset, or a stale
    snapshot whose endpoint was since removed by an earlier gate), and
    keeping the raw component label there would select a ghost — silently
    dropping the entire cluster from the output instead of one survivor."""
    comp = connected_components(pairs, src=src, dst=dst, nodes=docs, id_col=id_col)
    keep = (
        comp.join(docs.select(id_col), id_col)  # members that exist in docs
        .groupBy("component")
        .agg(F.min(id_col).alias(id_col))
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")
