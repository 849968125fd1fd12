"""Hierarchical (document-structure-aware) summarization (SURVEY §2.4
D12-D17; runners/run_summarization_ollama_mapreduce_hierarchical.py:200-313).

The reference walks a recursive JSON tree ``{type: Root|Document|Header|
Paragraph, text, children}`` bottom-up: for each depth level d (deepest
first), every non-Paragraph node's descendant-paragraph text is gathered,
summarized (via the map-reduce pipeline), and the node is replaced by a
Paragraph ``"title:\\nsummary"`` (HI:232-274); after level 1 the remaining
paragraphs are summarized once more with an editor pass (HI:296-313).

Spark has no recursive types, so the tree lives as a **flattened node table**
``(doc_id, node_id, parent_id, depth, node_type, text, path)`` where ``path``
is the ancestor node_id array (closure encoding) and node_id is DFS-preorder
— document order is an explicit sort key (D12). Descendant gathering (D14) is
then ``explode(path)`` + equi-join, never a recursive walk; level collapse is
a driver loop (D15) over pure DataFrame transforms.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import clean_thinking_tokens, strip_ws
from .approaches import mapreduce_summarize
from .summarizer import Summarizer

NODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("node_id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("node_type", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("path", T.ArrayType(T.LongType()), False),
    ]
)


def read_tree_json(spark, path: str) -> DataFrame:
    """JSON tree source (S3, run_full_evaluation_pipeline.py:505-514): load a
    (directory of) nested document-tree JSON file(s) as one raw JSON string
    per tree, ready for ``flatten_tree_json``. ``multiLine`` JSON values are
    read whole via the text source with recursive record joining disabled —
    each file is one tree."""
    import json as _json

    from ..sources.corpus import read_text_corpus

    trees = read_text_corpus(spark, path, glob="*.json").withColumnRenamed(
        "text", "tree_json"
    )
    # validate eagerly on a sample so malformed trees fail at load, not mid-job
    for row in trees.limit(1).collect():
        _json.loads(row.tree_json)
    return trees


def split_root_tree(trees: DataFrame, json_col: str = "tree_json") -> DataFrame:
    """Split the reference's corpus-level tree file into per-document trees.

    ``data_1/document_tree.json`` is one Root whose children are Document
    nodes keyed by filename stem (run_full_evaluation_pipeline.py:505-529).
    Output: one row per Document child — ``(doc_id, tree_json)`` — ready for
    ``flatten_tree_json``/``hierarchical_summarize``. The doc_id is the
    Document node's ``text``, i.e. the J4 tree-lookup join key.
    """
    import json as _json

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField(json_col, T.StringType(), False),
        ]
    )

    def split(batches):
        for pdf in batches:
            rows = []
            for tree in pdf[json_col]:
                root = _json.loads(tree) if isinstance(tree, str) else tree
                if not isinstance(root, dict):  # null/malformed row: skip
                    continue
                for child in root.get("children", []):
                    if child.get("type") == "Document":
                        rows.append(
                            {"doc_id": child.get("text", ""), json_col: _json.dumps(child)}
                        )
            yield pd.DataFrame(rows, columns=["doc_id", json_col])

    return trees.mapInPandas(split, out_schema)


def pair_docs_with_trees(
    docs: DataFrame, doc_trees: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """J4 tree-lookup join: documents matched to their tree (broadcast — the
    tree table is one row per doc of structure, tiny next to the corpus),
    plus the 'not found in tree structure, skipping' report side
    (run_full_evaluation_pipeline.py:527-529) as an anti-join."""
    matched = docs.join(F.broadcast(doc_trees), id_col, "inner")
    missing = docs.join(F.broadcast(doc_trees.select(id_col)), id_col, "left_anti")
    return matched, missing


def flatten_tree_json(trees: DataFrame, json_col: str = "tree_json", id_col: str = "doc_id") -> DataFrame:
    """JSON tree source (S3) -> flattened node table.

    Parsing is per-document Python (a tree is one JSON value), batched through
    ``mapInPandas``; the output table is what every subsequent operator joins
    against — no recursion anywhere downstream.
    """

    def parse(batches):
        for pdf in batches:
            rows = []
            for doc_id, tree in zip(pdf[id_col], pdf[json_col]):
                node = json.loads(tree) if isinstance(tree, str) else tree
                nid = 0
                # explicit stack (preorder: children pushed reversed so
                # they pop in document order) — recursion would hit
                # Python's ~1000-frame limit on deep trees; node_id
                # assignment order is identical to the recursive walk
                stack = [(node, None, 0, [])]
                while stack:
                    n, parent_id, depth, path = stack.pop()
                    if not isinstance(n, dict):
                        # a stray string/null child would otherwise die
                        # deep in the task as AttributeError — name the doc
                        raise ValueError(
                            f"malformed tree for doc {doc_id!r}: node at "
                            f"depth {depth} is {type(n).__name__}, "
                            "expected a JSON object"
                        )
                    rows.append(
                        {
                            "doc_id": str(doc_id),
                            "node_id": nid,
                            "parent_id": parent_id,
                            "depth": depth,
                            "node_type": n.get("type", "Paragraph"),
                            "text": n.get("text", ""),
                            "path": list(path),
                        }
                    )
                    child_path = path + [nid]
                    for ch in reversed(n.get("children", [])):
                        stack.append((ch, nid, depth + 1, child_path))
                    nid += 1
            yield pd.DataFrame(rows, columns=[f.name for f in NODE_SCHEMA.fields])

    return trees.mapInPandas(parse, NODE_SCHEMA)


def _max_depth(nodes: DataFrame) -> int:
    # deepest level with a collapsible (non-Paragraph) node: levels below it
    # hold only paragraphs, so starting the collapse loop there skips
    # guaranteed-no-op rounds (each would cost a scan + re-checkpoint)
    row = (
        nodes.filter(F.col("node_type") != "Paragraph")
        .agg(F.max("depth").alias("d"))
        .first()
    )
    return int(row["d"] or 0)


def _collapse_level(
    nodes: DataFrame,
    depth: int,
    summarizer: Summarizer,
    chunk_size: int,
    chunk_overlap: int,
    token_max: int,
    ckpt_bodies: bool = True,
    skip_empty_probe: bool = False,
) -> DataFrame:
    """Summarize every non-Paragraph node at ``depth`` and splice it back as
    a Paragraph, dropping its subtree (D13/D14/D15).

    ``ckpt_bodies`` (default on; off exists for the A/B probe) checkpoints
    the descendant-gather aggregate so it runs once per level: its three
    consumers — the inner map-reduce's convergence count, the ``replaced``
    join side, and the ``empty`` guard branch — would otherwise each
    recompute the explode+join+collect_list subtree when the level
    checkpoint materializes (measured ~35% of the query,
    plans/r13/probe_hierarchical_stages.json). The lazy checkpoint
    materializes under the inner loop's round-0 count, and the caller's
    post-level ``release_rdds`` diff frees it with the level's other pins."""
    targets = nodes.filter(
        (F.col("depth") == depth) & (F.col("node_type") != "Paragraph")
    ).select(
        F.col("doc_id").alias("t_doc"),
        F.col("node_id").alias("t_id"),
        F.col("parent_id").alias("t_parent"),
        strip_ws("text").alias("title"),
        F.col("path").alias("t_path"),
    )
    # the caller passes skip_empty_probe=True for the first (deepest) level:
    # _max_depth chose it BECAUSE a non-Paragraph node exists there, so the
    # empty-level guard would burn a driver job to learn nothing (r14,
    # guide §2.4 — don't run jobs whose answer is known)
    if not skip_empty_probe and targets.isEmpty():
        return nodes

    # descendant paragraph gather (D14): explode ancestor paths, equi-join
    paras = nodes.filter(F.col("node_type") == "Paragraph").select(
        "doc_id", "node_id", F.col("text").alias("p_text"), F.explode("path").alias("anc")
    )
    bodies = (
        targets.join(
            paras,
            (targets.t_doc == paras.doc_id) & (targets.t_id == paras.anc),
            "left",
        )
        .groupBy("t_doc", "t_id", "t_parent", "title", "t_path")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("p_text").isNotNull(),
                                F.struct(F.col("node_id").alias("o"), F.col("p_text").alias("t")),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                "\n\n",
            ).alias("body")
        )
    )
    if ckpt_bodies:
        # lazy: the inner collapse loop's round-0 convergence count is the
        # first action over this plan and materializes it; until then no job
        # runs. On a failure before that count the unmaterialized checkpoint
        # holds no executor memory (same exposure as the inner loop's own
        # round-0 checkpoint).
        bodies = bodies.localCheckpoint(eager=False)

    # empty-body guard (F8, HI:255-257): keep the bare title
    empty = bodies.filter(strip_ws("body") == "").select(
        "t_doc", "t_id", "t_parent", "t_path", F.col("title").alias("new_text")
    )
    nonempty = bodies.filter(strip_ws("body") != "")

    # section input = "title\n\nbody" (HI:259-261); summarize via map-reduce
    sec_in = nonempty.select(
        "t_doc",
        "t_id",
        "t_parent",
        "t_path",
        "title",
        F.when(F.col("title") != "", F.concat_ws("\n\n", "title", "body"))
        .otherwise(F.col("body"))
        .alias("sec_text"),
    )
    summarized = mapreduce_summarize(
        sec_in.withColumn("sec_key", F.concat_ws("#", "t_doc", F.col("t_id").cast("string"))),
        summarizer,
        chunk_size=chunk_size,
        chunk_overlap=chunk_overlap,
        token_max=token_max,
        id_col="sec_key",
        text_col="sec_text",
    )
    replaced = (
        sec_in.withColumn(
            "sec_key", F.concat_ws("#", "t_doc", F.col("t_id").cast("string"))
        )
        .join(summarized, "sec_key")
        .select(
            "t_doc",
            "t_id",
            "t_parent",
            "t_path",
            # "title:\nsummary" (HI:270-272)
            F.when(F.col("title") != "", F.concat(F.col("title"), F.lit(":\n"), F.col("summary")))
            .otherwise(F.col("summary"))
            .alias("new_text"),
        )
        .unionByName(empty)
    )

    new_paragraphs = replaced.select(
        F.col("t_doc").alias("doc_id"),
        F.col("t_id").alias("node_id"),
        F.col("t_parent").alias("parent_id"),
        F.lit(depth).alias("depth"),
        F.lit("Paragraph").alias("node_type"),
        F.col("new_text").alias("text"),
        F.col("t_path").alias("path"),
    )

    # drop targets and their descendants (path contains a target id), splice in
    target_ids = targets.select(F.col("t_doc").alias("doc_id"), F.col("t_id").alias("anc"))
    descendants = (
        nodes.select("doc_id", "node_id", F.explode("path").alias("anc"))
        .join(target_ids, ["doc_id", "anc"], "left_semi")
        .select("doc_id", "node_id")
        .distinct()
    )
    survivors = nodes.join(descendants, ["doc_id", "node_id"], "left_anti").join(
        target_ids.withColumnRenamed("anc", "node_id"), ["doc_id", "node_id"], "left_anti"
    )
    return survivors.unionByName(new_paragraphs)


def hierarchical_summarize(
    trees: DataFrame,
    summarizer: Summarizer,
    max_depth: int = 2,
    chunk_size: int = 12000,
    chunk_overlap: int = 200,
    token_max: int = 1000,
    json_col: str = "tree_json",
    id_col: str = "doc_id",
    polish: bool = True,
    ckpt_aggregates: bool = True,
    spread_parse: bool = False,
) -> DataFrame:
    """Bottom-up tree collapse (HI:296-313): levels min(max_depth, actual)
    down to 1, then a final map-reduce over each doc's remaining paragraphs
    and an optional editor polish pass (D17). Returns (doc_id, summary).

    ``spread_parse`` widens the per-tree Python JSON parse to
    ``defaultParallelism`` when the tree table plans fewer input splits,
    then shuffles the parsed node table BACK to the input's natural width
    before the checkpoint (decoupling parse width from the width the
    collapse loop's ~6 small driver jobs re-read every level — the naive
    wide-parse-wide-checkpoint arm lost in r13,
    plans/r13/probe_hier_flatten_spread.json). MEASURED AND REJECTED as
    default too (r14, plans/r14/probe_hier_parse_spread.json, 6-round
    interleaved A/B, identical results): +6.5%, wins 1/6 reps — the
    post-parse exchange of the node text costs more than the parallel
    parse saves at this scale. Kept as the rerunnable experiment arm; both
    branches are no-ops at production split counts."""
    from ..operators._ckpt import RollingCheckpoint

    from ..operators._ckpt import persistent_rdd_ids, release_rdds

    sc = trees.sparkSession.sparkContext
    rc = RollingCheckpoint(sc)
    try:
        raw = flatten_tree_json(trees, json_col, id_col)
        if spread_parse:
            n_in = max(1, trees.rdd.getNumPartitions())
            if n_in < sc.defaultParallelism:
                raw = flatten_tree_json(
                    trees.repartition(sc.defaultParallelism), json_col, id_col
                ).repartition(n_in)
        nodes = rc.checkpoint(raw)
        actual = _max_depth(nodes)
        for d in range(min(max_depth, actual), 0, -1):
            before = persistent_rdd_ids(sc)
            out = _collapse_level(
                nodes, d, summarizer, chunk_size, chunk_overlap, token_max,
                ckpt_bodies=ckpt_aggregates, skip_empty_probe=(d == actual),
            )
            if out is nodes:  # empty level: nothing collapsed, keep the checkpoint
                continue
            # rolling checkpoint: materializes the new level, then frees the old
            nodes = rc.checkpoint(out)
            # the level's INNER collapse loop (mapreduce per node group) left
            # its own final checkpoint pinned; once this level's checkpoint
            # materialized, those nested RDDs can never be read again —
            # release everything the level pinned except rc's own generation
            release_rdds(sc, (persistent_rdd_ids(sc) - before) - rc.live_ids)
    except BaseException:
        # a failed level (LLM summarizer error) must not pin the superseded
        # checkpoint for the session
        rc.release()
        raise

    final_in = (
        nodes.filter(F.col("node_type") == "Paragraph")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("node_id").alias("o"), F.col("text").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                "\n\n",
            ).alias("doc_text")
        )
    )
    if ckpt_aggregates:
        # same single-evaluation trick for the final per-doc gather: its two
        # consumers (the final map-reduce's convergence count and the
        # retain-join id side materialized by the caller's action) would
        # each recompute the collect_list aggregate. Lazy — materializes
        # under the final collapse's round-0 count; stays live behind the
        # returned DataFrame's plan, like the loop's final node checkpoint.
        final_in = final_in.localCheckpoint(eager=False)
    final = mapreduce_summarize(
        final_in,
        summarizer,
        chunk_size=chunk_size,
        chunk_overlap=chunk_overlap,
        token_max=token_max,
        id_col="doc_id",
        text_col="doc_text",
    )
    if polish:
        final = summarizer.summarize_df(final, "summary", "summary")
    # one row per INPUT doc, like every other approach: a tree with no
    # Paragraph node (empty root, headers only) produced zero final_in rows
    # and the doc silently vanished from the output — left-join back to the
    # input ids (stringified, as flatten_tree_json keys them) with the same
    # empty-summary coalesce the other approaches use
    all_ids = trees.select(F.col(id_col).cast("string").alias("doc_id")).distinct()
    return all_ids.join(final, "doc_id", "left").select(
        "doc_id", F.coalesce(clean_thinking_tokens("summary"), F.lit("")).alias("summary")
    )
