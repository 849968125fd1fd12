"""Round-9 hardening pins (VERDICT r8 item 5, ADVICE r8).

1. Critique NULL-section tagging contract: the Python critique reducer and
   the collapse JVM twin handle NULL member texts differently at the
   presentation layer (tag kept with empty body vs element dropped) but
   MUST agree on the observable content — a NULL chunk summary contributes
   zero tokens in both engines, and the literal string 'None' never leaks.
2. rouge_n_f1_df bounded cache book-keeping: a long-lived session that
   ignores the _persisted_inputs release hook must not accumulate pinned
   cache without bound.
"""

from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.collapse import (
    reduce_groups,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
    MockCritic,
    MockSummarizer,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.critique import (
    _reduce_with_critique,
)


class _CapturingSummarizer(MockSummarizer):
    """MockSummarizer that records the raw reduce input (pre-whitespace-
    normalization), so the tagging layer itself is assertable."""

    def summarize_text(self, text: str) -> str:
        self.seen = text
        return super().summarize_text(text)


def test_critique_null_section_tagging_contract(spark):
    """VERDICT r8 item 5: pin the NULL-member contract on BOTH reduce
    engines for the same input, so a refactor of either side that changes
    what a NULL chunk summary contributes fails here loudly.

    Python critique reducer (summarize/critique.py): a NULL member keeps
    its [PHẦN i] tag with an EMPTY body — never the literal 'None'.
    Collapse JVM twin (operators/collapse.py reduce_groups): array_join
    drops NULL elements entirely, no dangling separator. The observable
    contract: content tokens agree exactly once tags are stripped — the
    tag-for-empty-section asymmetry is presentation, not content."""
    texts = ["alpha one", None, "beta two"]

    s = _CapturingSummarizer(100)  # budget >> input: output = tagged input
    out = _reduce_with_critique(
        texts, ["o1", None, "o3"], s, MockCritic(),
        iteration=5, max_critique_iterations=2,  # past cap: no critique leg
    )
    # raw tagging layer: tag kept for the NULL section, body empty
    assert s.seen == (
        "[PHẦN 1]\nalpha one\n\n[PHẦN 2]\n\n\n[PHẦN 3]\nbeta two"
    )
    assert "None" not in out

    rows = [(1, 0, 0, "alpha one"), (1, 1, 0, None), (1, 2, 0, "beta two")]
    df = spark.createDataFrame(
        rows, "doc_id int, chunk_idx int, group_id int, text string"
    )
    jvm = reduce_groups(df, MockSummarizer(100)).collect()
    assert len(jvm) == 1
    # NULL element dropped with NO dangling separator between survivors
    assert jvm[0].text == "alpha one beta two"

    # the cross-engine contract: identical content tokens modulo tags
    content = [t for t in out.split() if t != "[PHẦN" and not t.endswith("]")]
    assert content == jvm[0].text.split()


def test_rouge_keyed_cache_is_bounded(spark):
    """ADVICE r8: rouge_n_f1_df persists its window-keyed intermediate for
    the 3 downstream branches; callers that never release the
    _persisted_inputs hook must still see bounded pinned cache — the
    enrollment FIFO force-releases beyond _MAX_LIVE_KEYED entries."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.metrics import rouge
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        persistent_rdd_ids,
    )

    pairs = spark.createDataFrame(
        [(i, f"a b c d{i}", f"b c e f{i}") for i in range(6)],
        "doc_id int, g string, r string",
    )
    before = len(persistent_rdd_ids(spark.sparkContext))
    results = []
    for i in range(rouge._MAX_LIVE_KEYED + 5):
        # vary the plan per call so each persist is a distinct cache entry
        r = rouge.rouge1_f1_df(pairs.withColumn("g", F.concat("g", F.lit(i))))
        r.count()  # materialize the cache
        results.append(r)  # caller "forgets" to release the hook
    live = len(persistent_rdd_ids(spark.sparkContext)) - before
    assert live <= rouge._MAX_LIVE_KEYED, (
        f"{live} keyed caches pinned — enrollment FIFO not bounding"
    )
    # releasing via the documented hook still works for the survivors
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.dedup import (
        unpersist_inputs,
    )

    for r in results:
        unpersist_inputs(r)
    # <= not ==: in a shared session the FIFO may also have evicted keyed
    # caches a PRIOR test leaked (they were counted in `before`) — that is
    # the FIFO working as designed, not a release failure here
    assert len(persistent_rdd_ids(spark.sparkContext)) <= before


def test_rollup_empty_input_divergence_and_ansi_wrappers(spark):
    """Round-9 differential-fuzzer finding (4/200 seeded shapes): Spark's
    grouping-set aggregates return ZERO rows over an empty input, while
    ANSI (DuckDB, Postgres) require the () grouping set to act as a global
    aggregate — one grand-total row (count 0, sum NULL). Pin BOTH: the raw
    Spark behavior (so an upstream Spark fix shows up as a failure here and
    the fuzzer's known-divergence class can be retired), and the
    operators.ansi_rollup/ansi_cube wrappers that restore the row."""
    import duckdb

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        ansi_cube,
        ansi_rollup,
    )

    df = spark.createDataFrame(
        [(1, "a", "x", 2.0), (2, "a", "y", 3.0), (3, "b", "x", 5.0)],
        "k int, s string, u string, v double",
    )
    empty = df.filter("k > 99")

    # raw Spark: zero rows on empty input (the divergence)
    assert spark.sql(
        "SELECT 1"
    ) is not None  # session alive
    assert empty.rollup("s").agg(F.count(F.lit(1))).count() == 0
    assert empty.cube("s").agg(F.count(F.lit(1))).count() == 0

    # the ANSI reference behavior, replayed live so the pin tracks DuckDB
    con = duckdb.connect()
    con.sql("CREATE TABLE t (k int, s varchar, v double)")
    ref = con.sql(
        "SELECT s, count(*) c, sum(v) sv FROM t GROUP BY ROLLUP(s)"
    ).fetchall()
    assert ref == [(None, 0, None)]

    # wrappers: empty input -> exactly the ANSI grand-total row
    got = ansi_rollup(
        empty, ("s",), F.count(F.lit(1)).alias("c"), F.sum("v").alias("sv")
    ).collect()
    assert [(r.s, r.c, r.sv) for r in got] == [(None, 0, None)]
    got_cube = ansi_cube(
        empty, ("s", "u"), F.count(F.lit(1)).alias("c")
    ).collect()
    assert [(r.s, r.u, r.c) for r in got_cube] == [(None, None, 0)]

    # wrappers: NON-empty input -> byte-identical to the plain form
    plain = sorted(
        ((r.s, r.c, r.sv)
         for r in df.rollup("s").agg(
             F.count(F.lit(1)).alias("c"), F.sum("v").alias("sv")
         ).collect()),
        key=repr,
    )
    wrapped = sorted(
        ((r.s, r.c, r.sv)
         for r in ansi_rollup(
             df, ("s",), F.count(F.lit(1)).alias("c"), F.sum("v").alias("sv")
         ).collect()),
        key=repr,
    )
    assert plain == wrapped
    assert (None, 3, 10.0) in wrapped  # grand total present once, not doubled


def test_nan_semantics_agree_across_engines(spark):
    """Round-9 probe of the other float minefield: both engines treat NaN
    identically — NaN = NaN is TRUE (unlike IEEE), NaN sorts above every
    other double, and grouping collapses NaNs into one group. Pinned as
    AGREEMENT (the testdata carries no NaNs, so nothing else exercises
    this): if either engine changes, the differential harnesses need a
    known-divergence class before anything else trips."""
    import duckdb

    srow = spark.sql(
        "SELECT CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS eq, "
        "CAST('NaN' AS DOUBLE) > CAST(1e308 AS DOUBLE) AS gt"
    ).collect()[0]
    assert (srow.eq, srow.gt) == (True, True)
    sgroups = spark.sql(
        "SELECT x, count(*) c FROM (SELECT CAST('NaN' AS DOUBLE) x "
        "UNION ALL SELECT CAST('NaN' AS DOUBLE) UNION ALL SELECT 1.0) "
        "GROUP BY x ORDER BY x"
    ).collect()
    con = duckdb.connect()
    drow = con.sql(
        "SELECT 'NaN'::DOUBLE = 'NaN'::DOUBLE, 'NaN'::DOUBLE > 1e308"
    ).fetchone()
    assert drow == (True, True)
    dgroups = con.sql(
        "SELECT x, count(*) c FROM (SELECT 'NaN'::DOUBLE x "
        "UNION ALL SELECT 'NaN'::DOUBLE UNION ALL SELECT 1.0) "
        "GROUP BY x ORDER BY x"
    ).fetchall()
    import math

    norm = lambda rows: [("nan" if math.isnan(x) else x, c) for x, c in rows]
    assert norm([(r.x, r.c) for r in sgroups]) == norm(dgroups) == [
        (1.0, 1), ("nan", 2)
    ]


def test_unicode_string_semantics_agree_across_engines(spark):
    """Round-9 probe: the testdata is pure ASCII but the engine's domain is
    Vietnamese text, so pin the non-ASCII string semantics both engines
    share — character (not byte) length/substring, Unicode case mapping
    incl. Vietnamese diacritics, LIKE over multibyte, binary collation
    ordering, and || concat."""
    import duckdb

    q = (
        "SELECT length('tiếng Việt') AS l1, length('日本語') AS l2, "
        "upper('tiếng việt ế') AS u, lower('TIẾNG VIỆT Ế') AS lo, "
        "substring('tiếng Việt', 1, 5) AS s1, "
        "'tiếng Việt' LIKE 'tiếng%' AS lk, "
        "'việt' || '_' || '日本' AS cc"
    )
    srow = spark.sql(q).collect()[0]
    con = duckdb.connect()  # keep a strong ref: the relation is lazy
    drow = con.sql(q).fetchone()
    assert tuple(srow) == drow
    assert (srow.l1, srow.l2) == (10, 3)  # characters, not bytes
    assert srow.u == "TIẾNG VIỆT Ế" and srow.lo == "tiếng việt ế"
