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


# ---------------------------------------------------------------------------
# Round-10 harness work (VERDICT r9 item 5 + ADVICE r9): the widened fuzzer
# grammar and the tightened tolerant comparator.


def _fuzz_mod():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fuzz_differential",
        os.path.join(repo, "examples", "fuzz_differential.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_grammar_reaches_18_plus_kinds():
    """VERDICT r9 item 5: grammar kinds >= 18, with the five prescribed
    round-10 composition families present by name."""
    fz = _fuzz_mod()
    assert len(fz.ShapeGen.KINDS) >= 18
    for k in ("join_chain3", "having_agg", "distinct_window",
              "setop_subquery", "unicode_lab"):
        assert k in fz.ShapeGen.KINDS


def test_new_kinds_live_batch(spark, sf_dir):
    """A fresh live Spark-vs-DuckDB batch restricted to the five round-10
    kinds — distinct seed family from both the nightly run and the
    standing 10-shape smoke, so sessions keep widening coverage."""
    fz = _fuzz_mod()
    seeds = [10_100_000 + i for i in range(10)]
    kinds = ["join_chain3", "having_agg", "distinct_window",
             "setop_subquery", "unicode_lab"]
    results = fz.run_shapes(spark, sf_dir, seeds, log=lambda m: None,
                            kinds=kinds)
    bad = [r for r in results
           if r["status"] not in ("ok", "float_jitter", "known_divergence")]
    assert not bad, f"differential failures: {bad}"
    assert {r["kind"] for r in results} <= set(kinds)


def test_unicode_lab_pool_agreement(spark):
    """Cross-engine pin of the EXACT literal pool and function set the
    unicode_lab grammar draws from: character-semantics functions over
    composed/decomposed Vietnamese, CJK, and an astral emoji, plus the
    binary-collation ordering of the full pool. If either engine changes
    string semantics, this fails before the fuzzer starts flaking."""
    import duckdb

    fz = _fuzz_mod()
    pool = list(fz.ShapeGen.VN_POOL)
    probes = []
    for s in pool:
        lit = "'" + s.replace("'", "''") + "'"
        probes += [f"upper({lit})", f"lower({lit})", f"length({lit})",
                   f"substring({lit}, 2, 4)", f"{lit} LIKE 'b%'",
                   f"{lit} < 'tó'", f"{lit} >= 'Đ'", f"{lit} || '_k'"]
    q = "SELECT " + ", ".join(f"{p} AS c{i}" for i, p in enumerate(probes))
    srow = tuple(spark.sql(q).collect()[0])
    con = duckdb.connect()  # keep a strong ref: the relation is lazy
    drow = con.sql(q).fetchone()
    bad = [(probes[i], a, b)
           for i, (a, b) in enumerate(zip(srow, drow)) if a != b]
    assert not bad, f"string-semantics disagreements: {bad}"
    # binary-collation ORDER BY over the pool agrees
    sdf = spark.createDataFrame(list(enumerate(pool)), "pk int, vtxt string")
    sdf.createOrReplaceTempView("vlds_vn_pool")
    so = [r[0] for r in spark.sql(
        "SELECT pk FROM vlds_vn_pool ORDER BY vtxt ASC, pk").collect()]
    con.sql("CREATE TABLE vn(pk int, vtxt varchar)")
    for i, s in enumerate(pool):
        con.execute("INSERT INTO vn VALUES (?, ?)", [i, s])
    do = [r[0] for r in con.sql(
        "SELECT pk FROM vn ORDER BY vtxt ASC, pk").fetchall()]
    assert so == do
    spark.catalog.dropTempView("vlds_vn_pool")


def test_tolerant_equal_requires_relative_closeness():
    """ADVICE r9: the round-boundary jitter class must ALSO be relatively
    close — a 2x divergence on small magnitudes (0.001 vs 0.002) is one
    unit in the last place yet a genuine difference, and must stay loud."""
    fz = _fuzz_mod()
    ok = fz._tolerant_equal
    assert not ok([("0.001", "a")], [("0.002", "a")])   # 2x: real diff
    assert ok([("516.449", "a")], [("516.448", "a")])   # knife-edge: jitter
    assert not ok([("516.449", "a")], [("516.446", "a")])


def test_norm_cell_renders_infinity():
    """ADVICE r9: non-finite floats normalize to 'inf'/'-inf' (a recorded
    diff) instead of crashing the sweep with OverflowError."""
    fz = _fuzz_mod()
    assert fz._norm_cell(float("inf")) == "inf"
    assert fz._norm_cell(float("-inf")) == "-inf"
    assert fz._norm_cell(float("nan")) == "<null>"


def _closure_mod():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "components_closure_sf01",
        os.path.join(repo, "examples", "components_closure_sf01.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_components_oracle_slicer_stays_anchored():
    """The sf0.1 components-parity harness executes the registry oracle's
    OWN text (sliced around the reach/comp closure). If the oracle SQL is
    ever refactored, slicing must fail loudly rather than silently verify
    something else — pin both the slice anchors and the three-way shared
    prefix here, inside the suite."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import (
        ORACLES,
    )

    cl = _closure_mod()
    prefixes = set()
    for name in cl.COMPONENT_QUERIES:
        prefix, final = cl.slice_oracle(ORACLES[name])
        assert prefix.startswith("WITH")
        # prefix = pair generation + symmetric edges, nothing of the
        # bounded closure; final = the post-comp select only
        assert "edges AS MATERIALIZED" in prefix and "l0 AS" not in prefix
        assert "comp" in final and "l0 AS" not in final and "conv" not in final
        prefixes.add(prefix)
    assert len(prefixes) == 1, "component oracles drifted apart"


def test_components_closure_live_at_test_sf(spark, sf_dir, tmp_path):
    """Run the full iterative-closure parity harness per-session at the
    test scale: oracle-prefix edge materialization, min-label flooding to
    the comp fixed point, and all three final selects matching the Spark
    registry queries bit-for-bit."""
    cl = _closure_mod()
    rec = cl.run(sf_dir, str(tmp_path / "components.json"),
                 log=lambda m: None)
    assert rec["all_match"], rec
    assert rec["flood_rounds"] < 50
    assert len(rec["queries"]) == 3


def test_components_sf01_artifact_is_clean():
    """components_sf01_last.json is the recorded sf0.1 parity for the
    three oracles the budget-bounded sweep skips (VERDICT r9 item 4):
    the oracle's own pair generation + an equivalent iterative closure,
    all three bit-for-bit against Spark at sf0.1."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "components_sf01_last.json")) as f:
        d = json.load(f)
    assert d["all_match"] is True
    assert d["sf_dir"].endswith("sf0.1")
    names = {q["query"] for q in d["queries"]}
    assert names == {"doc_dedup_keep_best", "doc_dedup_survivors",
                     "doc_dup_clusters"}
    assert all(q["values_match"] for q in d["queries"])


def test_flooding_matches_union_find_on_random_graphs():
    """Property: min-label flooding (the DuckDB closure that replaces the
    oracle's reach CTE at sf0.1) computes min(component) per node on ANY
    symmetric edge set — checked against an independent Python union-find
    over hypothesis-generated random graphs, not just the shipped data."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    cl = _closure_mod()

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=40),
        edges=st.lists(
            st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=120),
    )
    def check(n, edges):
        edges = [(a, b) for a, b in edges if a < n and b < n and a != b]
        # independent reference: union-find with min-root bookkeeping
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in range(n)}

        con = duckdb.connect()
        con.sql("CREATE TEMP TABLE nodes(doc_id BIGINT)")
        con.executemany("INSERT INTO nodes VALUES (?)",
                        [(i,) for i in range(n)])
        con.sql("CREATE TEMP TABLE g(a BIGINT, b BIGINT)")
        sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
        if sym:
            con.executemany("INSERT INTO g VALUES (?, ?)", sym)
        rounds = cl.flood_components(con, "g", "nodes")
        got = dict(con.sql(
            "SELECT doc_id, cluster_id FROM comp").fetchall())
        con.close()
        assert got == want
        assert rounds <= n + 1

    check()
