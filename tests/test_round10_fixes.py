"""Round-10 plan pins (VERDICT r9 items 1-2: the probe-driven rewrites).

The r9 driver bench flagged doc_char_entropy, doc_feature_hash_embed and
doc_pii_redact; the r10 probe reproduced them with healthy non-family
controls, and the plan audit rewrote all three to zero-exchange per-row
forms (a document is one row — nothing about these statistics needs a
shuffle). These tests pin BOTH halves of each fix so a refactor cannot
silently regress either:

1. the physical plan stays shuffle-free (`Exchange` count pinned), and
2. the per-row expression computes the exact same values as the old
   explode/aggregate shape (checked against an independently computed
   Python reference, including NULL/empty/astral-char edges).
"""

import math

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.pii import (
    pii_counts,
    redact_pii,
    redact_pii_with_counts,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.textstats import (
    char_entropy_batch,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.features import (
    feature_hash_embed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _py_entropy(text: str) -> tuple[int, float]:
    if not text:
        return 0, 0.0
    cps = list(text)  # Python str iterates code points, like Java regex
    n = len(cps)
    counts = {}
    for c in cps:
        counts[c] = counts.get(c, 0) + 1
    ent = math.log2(n) - sum(c * math.log2(c) for c in counts.values()) / n
    return n, round(ent, 6)


def test_char_entropy_zero_exchange_and_values(spark):
    """The r10 rewrite: sorted-run regex form, zero shuffle, one core per
    input split. Values must match an independent Python computation on
    edge-heavy inputs: NULL, empty, single-char runs, multibyte
    Vietnamese, an astral (surrogate-pair) char, and embedded newlines
    (the `(?s)` pin — sorted text can contain \\n)."""
    rows = [
        (1, "aabbcc"),
        (2, None),
        (3, ""),
        (4, "x"),
        (5, "tóm tắt văn bản tiếng Việt"),
        (6, "a\U0001F600b\U0001F600"),  # astral: counts once per code point
        (7, "line1\nline2\nline1\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = char_entropy_batch(df, "doc_id", "text")

    plan = _plan(out)
    assert plan.count("Exchange") == 0, plan

    got = {r["doc_id"]: (r["n_chars"], r["entropy"]) for r in out.collect()}
    for doc_id, text in rows:
        assert got[doc_id] == _py_entropy(text or ""), (doc_id, got[doc_id])


def test_char_entropy_accepts_duplicate_ids(spark):
    """Unlike the retired explode/groupBy form, the per-row form must
    score each row independently even when ids collide."""
    df = spark.createDataFrame([(1, "aa"), (1, "ab")], "doc_id int, text string")
    out = char_entropy_batch(df, "doc_id", "text").collect()
    assert sorted(r["entropy"] for r in out) == [0.0, 1.0]


def test_feature_hash_embed_default_path_no_doc_shuffle(spark, sf_dir):
    """The r10 default path is per-row HOFs + a <=dims sparse explode: the
    only allowed Exchange is none at all (no groupBy, no norm join)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = feature_hash_embed(docs, dims=32)
    plan = _plan(out)
    assert plan.count("Exchange") == 0, plan
    assert "Generate" in plan, plan  # the sparse-entry explode remains


def test_feature_hash_embed_paths_agree(spark, sf_dir):
    """The zero-shuffle default and the shared-postings path are two
    physical plans for one function: identical (id, dim, weight) sets,
    normalized and unnormalized."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.retrieval import (
        term_postings,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    post = term_postings(docs, "text", "doc_id")
    for normalize in (True, False):
        a = feature_hash_embed(docs, dims=16, normalize=normalize)
        b = feature_hash_embed(docs, dims=16, normalize=normalize, postings=post)
        rows_a = {(r["doc_id"], r["dim"]): r["weight"] for r in a.collect()}
        rows_b = {(r["doc_id"], r["dim"]): r["weight"] for r in b.collect()}
        assert rows_a == rows_b


def test_redact_pii_with_counts_staged_and_consistent(spark):
    """The staged DataFrame form: zero shuffle, and values identical to
    the single-Column primitives it replaces (pii_counts + redact_pii),
    including the NULL contract (counts 0, redacted NULL)."""
    rows = [
        (1, "mail a@b.vn or c.d+x@e.org, call +84-555-0199, host 10.0.0.1"),
        (2, None),
        (3, "no pii here"),
        (4, "ip 192.168.1.255 twice 192.168.1.255"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = redact_pii_with_counts(df, "text")
    plan = _plan(out)
    assert plan.count("Exchange") == 0, plan

    ref = df.select(
        "doc_id",
        pii_counts("text")["email"].alias("n_email"),
        pii_counts("text")["phone"].alias("n_phone"),
        pii_counts("text")["ipv4"].alias("n_ipv4"),
        redact_pii("text").alias("redacted"),
    )
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    want = {r["doc_id"]: r.asDict() for r in ref.collect()}
    assert got == want
    assert got[2]["redacted"] is None and got[2]["n_email"] == 0
