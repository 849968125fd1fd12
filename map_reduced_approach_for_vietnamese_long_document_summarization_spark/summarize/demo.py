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
) -> dict[str, dict]:
    """Run the requested approaches on one document; returns
    {approach: {summary, rouge1_f?, rouge2_f?, rougeL_f?}} — metrics only
    when a gold ``reference`` is supplied (compute_metrics,
    streamlit_demo.py:61-79)."""
    approaches = approaches or list(APPROACHES)
    doc = spark.createDataFrame([("upload", text)], ["doc_id", "text"])
    out: dict[str, dict] = {}
    for name in approaches:
        # same approach table (and defaults) as the sweep pipeline
        summary = APPROACHES[name](doc, summarizer, {}).first()["summary"]
        cell: dict = {"summary": summary}
        if reference is not None:
            r1, r2, rl = rouge_pair(summary, reference)
            cell.update({"rouge1_f": r1, "rouge2_f": r2, "rougeL_f": rl})
        out[name] = cell
    return out
