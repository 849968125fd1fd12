"""PII detection/redaction for training-data pipelines (north-star,
BASELINE.json): the pass every public-web corpus runs before training
(C4/RefinedWeb/Gopher appendix hygiene) — find emails, phone numbers, and
IP addresses, count them per document, and replace them with typed
placeholder tags.

Pure Catalyst ``regexp_replace``/``regexp_count`` expressions — scan-speed
at 100 TB, whole-stage codegen, no Python anywhere. The patterns are
deliberately conservative, RE2-compatible (so a DuckDB oracle replays them
verbatim), and documented as a *recall floor*: production stacks layer
model-based NER on top for names/addresses, which has no place in a
regex pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pattern order matters: emails are redacted before phones/IPs so a digit
# run inside a local-part can't be double-tagged. All patterns avoid
# backreferences/lookaround (Java regex AND RE2/DuckDB compatible).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_TAGS: dict[str, str] = {
    "email": "[EMAIL]",
    "phone": "[PHONE]",
    "ipv4": "[IP]",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> Column:
    """Struct of per-kind match counts (email, phone, ipv4) — the audit
    metric a redaction job reports. NULL text counts as zero matches.

    Counted SEQUENTIALLY, each kind on the text with all earlier kinds
    already redacted — exactly the tags ``redact_pii`` emits. Counting
    every kind on the raw text would double-count nested matches (an IPv4
    inside an email local-part: '1.2.3.4@x.com' is ONE [EMAIL] tag, but
    raw counting reports email=1 AND ipv4=1, so an audit reconciling
    counts against emitted tags flags a phantom redaction failure). The
    placeholder tags contain no digits or '@', so redacting one kind
    cannot manufacture matches for a later kind."""
    s = F.coalesce(_c(col), F.lit(""))
    counts = []
    for k, p in PII_PATTERNS.items():
        counts.append(F.regexp_count(s, F.lit(p)).alias(k))
        s = F.regexp_replace(s, p, PII_TAGS[k])
    return F.struct(*counts)


def redact_pii_with_counts(df, text_col: str = "text"):
    """Audit-grade redaction pass over a DataFrame: appends per-kind match
    counts (``n_email``/``n_phone``/``n_ipv4``, the sequential no-nested-
    double-count semantics of ``pii_counts``) and the fully redacted text
    (``redacted``), keeping every other input column.

    Each intermediate redaction stage is materialized in its OWN projection
    (``_s1`` = email-redacted, ``_s2`` = +phone-redacted), so every
    ``regexp_replace`` pass runs exactly once per row by construction —
    the single-Column forms (``pii_counts`` + ``redact_pii`` side by side)
    express the same values but leave de-duplicating the shared replace
    chain to codegen subexpression elimination, which the interpreted /
    fallback evaluation paths don't get. Six regex passes per row total
    (3 counts + 3 replaces), scan-speed, zero shuffle (round-10 plan
    audit of ``doc_pii_redact``). NULL text: counts 0 (``pii_counts``
    contract), ``redacted`` NULL (``redact_pii`` contract — the chain runs
    on the raw column, through which ``regexp_replace`` propagates NULL)."""
    others = [c for c in df.columns if c != text_col]
    cnt = lambda c, p: F.regexp_count(  # noqa: E731
        F.coalesce(F.col(c), F.lit("")), F.lit(PII_PATTERNS[p])
    )
    staged = df.select(
        *others,
        F.col(text_col).alias("_s0"),
        F.regexp_replace(
            F.col(text_col), PII_PATTERNS["email"], PII_TAGS["email"]
        ).alias("_s1"),
    ).select(
        *others,
        "_s0",
        "_s1",
        F.regexp_replace("_s1", PII_PATTERNS["phone"], PII_TAGS["phone"]).alias("_s2"),
    )
    return staged.select(
        *others,
        cnt("_s0", "email").alias("n_email"),
        cnt("_s1", "phone").alias("n_phone"),
        cnt("_s2", "ipv4").alias("n_ipv4"),
        F.regexp_replace("_s2", PII_PATTERNS["ipv4"], PII_TAGS["ipv4"]).alias("redacted"),
    )


def redact_pii(col: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match with its typed tag ([EMAIL]/[PHONE]/[IP]),
    in PII_PATTERNS order. NULL propagates (no text, no redaction).
    ``kinds=None`` means all kinds; an explicit empty tuple redacts
    nothing (callers building ``kinds`` dynamically rely on that)."""
    out = _c(col)
    if kinds is None:
        kinds = tuple(PII_PATTERNS)
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k], PII_TAGS[k])
    return out
