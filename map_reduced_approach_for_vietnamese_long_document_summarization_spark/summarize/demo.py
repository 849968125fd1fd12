"""Single-document interactive API (SURVEY §3 EP2: ``streamlit_demo.py``).

The reference's demo runs all five approaches on one uploaded document and
tabulates metrics (streamlit_demo.py:231-287). Engine shape: the same
corpus-scale transforms invoked on a one-row DataFrame (S8 upload source =
``createDataFrame``) — caching/"st.cache_resource" is simply the reused
SparkSession + the summarizer object held by the caller.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..metrics.rouge import rouge_pair
from .pipeline import APPROACHES
from .summarizer import Summarizer


def summarize_document(
    spark: SparkSession,
    text: str,
    summarizer: Summarizer,
    approaches: list[str] | None = None,
    reference: str | None = None,
    tree_json: str | None = None,
) -> dict[str, dict]:
    """Run the requested approaches on one document; returns
    {approach: {summary, rouge1_f?, rouge2_f?, rougeL_f?}} — metrics only
    when a gold ``reference`` is supplied (compute_metrics,
    streamlit_demo.py:61-79).

    The demo's fifth tab, ``mapreduce_hierarchical``, needs the document's
    pre-built structure tree (streamlit_demo.py:141-155 loads it from a JSON
    file and skips when absent) — pass the tree as ``tree_json`` to include
    it; text-only approaches come from the sweep pipeline's approach table.
    """
    approaches = approaches or list(APPROACHES) + (
        ["mapreduce_hierarchical"] if tree_json is not None else []
    )
    doc = spark.createDataFrame([("upload", text)], ["doc_id", "text"])
    out: dict[str, dict] = {}
    for name in approaches:
        if name == "mapreduce_hierarchical":
            if tree_json is None:
                # same observable behavior as the demo's missing-tree branch;
                # carry None metric cells so a reference-bearing comparison
                # table renders 'n/a' instead of crashing on a missing key
                cell = {"summary": "(No tree file found)"}
                if reference is not None:
                    cell.update({"rouge1_f": None, "rouge2_f": None, "rougeL_f": None})
                out[name] = cell
                continue
            from .hierarchical import hierarchical_summarize

            trees = spark.createDataFrame([("upload", tree_json)], ["doc_id", "tree_json"])
            summary = hierarchical_summarize(trees, summarizer).first()["summary"]
        else:
            # same approach table (and defaults) as the sweep pipeline
            summary = APPROACHES[name](doc, summarizer, {}).first()["summary"]
        cell: dict = {"summary": summary}
        if reference is not None:
            r1, r2, rl = rouge_pair(summary, reference)
            cell.update({"rouge1_f": r1, "rouge2_f": r2, "rougeL_f": rl})
        out[name] = cell
    return out


def compare_approaches(
    spark: SparkSession,
    text: str,
    summarizer: Summarizer,
    approaches: list[str] | None = None,
    reference: str | None = None,
    tree_json: str | None = None,
):
    """The demo's tabbed comparison as one DataFrame (streamlit_demo.py:
    231-287): one row per approach with the summary and — when a gold
    ``reference`` is given — the ROUGE columns the demo tabulates. Row order
    follows the approach table, like the demo's tab order; pass ``tree_json``
    to include the hierarchical tab."""
    cells = summarize_document(spark, text, summarizer, approaches, reference, tree_json)
    if reference is not None:
        rows = [
            (n, c["summary"], c["rouge1_f"], c["rouge2_f"], c["rougeL_f"])
            for n, c in cells.items()
        ]
        schema = "approach string, summary string, rouge1_f double, rouge2_f double, rougeL_f double"
    else:
        rows = [(n, c["summary"]) for n, c in cells.items()]
        schema = "approach string, summary string"
    return spark.createDataFrame(rows, schema)
