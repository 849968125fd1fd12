"""Seeded differential fuzzer over the relational surface (VERDICT r8 item 4).

The 141-oracle registry is frozen and green; the residual correctness risk
is operator COMPOSITIONS the fixed registry never exercises. This harness
generates N seeded random query shapes — filter / FK-join / aggregate /
window / set-op / IN- and EXISTS-subquery compositions over the sf tables,
bounded depth — and runs each through BOTH engines with the same
SQL-generation discipline the shared-SQL family uses
(``plans/subqueries._sql``: one ANSI text, Spark reads ``vlds_sq_``-prefixed
temp views, DuckDB replays the bare names), then diffs with the driver's
normalization (sorted columns, sorted rows, floats rounded to 9).

This is the same class of check that caught the reference's own semantic
quirks (population std, NULL-join behavior), applied beyond the frozen set.
The grammar stays inside the dialect subset both engines implement
identically; every ORDER BY pins NULLS FIRST/LAST explicitly (the engines'
defaults differ), every LIMIT orders by ALL output columns (multiset-
deterministic), and every float aggregate is rounded in-SQL. A strict
mismatch is retried under float tolerance (isclose rel 1e-6) and triaged
``float_jitter`` if it passes — accumulation-order noise, not semantics.

    python examples/fuzz_differential.py [--n 200] [--seed 9001]
                                         [--sf-dir /root/testdata/sf0.01]
                                         [--out fuzz_last.json]
                                         [--replay SEED [SEED ...]]

Every shape's record carries its own seed and full SQL; ``--replay``
regenerates exactly those shapes for triage. Exit 1 on any diff or
one-sided engine error, 0 clean.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------- schema map

# kinds: i = integer, f = double, s = varchar, t = timestamp
TABLES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "i", "r_name": "s"},
    "nation": {"n_nationkey": "i", "n_name": "s", "n_regionkey": "i"},
    "customer": {"c_custkey": "i", "c_name": "s", "c_nationkey": "i",
                 "c_acctbal": "f", "c_mktsegment": "s"},
    "supplier": {"s_suppkey": "i", "s_name": "s", "s_nationkey": "i",
                 "s_acctbal": "f"},
    "part": {"p_partkey": "i", "p_name": "s", "p_brand": "s", "p_type": "s",
             "p_size": "i", "p_retailprice": "f"},
    "orders": {"o_orderkey": "i", "o_custkey": "i", "o_orderstatus": "s",
               "o_totalprice": "f", "o_orderdate": "t", "o_orderpriority": "s"},
    "lineitem": {"l_orderkey": "i", "l_partkey": "i", "l_suppkey": "i",
                 "l_linenumber": "i", "l_quantity": "f", "l_extendedprice": "f",
                 "l_discount": "f", "l_tax": "f", "l_returnflag": "s",
                 "l_linestatus": "s", "l_shipdate": "t"},
    "events": {"event_id": "i", "ts": "t", "user_id": "i", "event_type": "s",
               "value": "f"},
    "documents": {"doc_id": "i", "lang": "s", "source": "s", "n_chars": "i"},
}
# id-ish column per table (output labeling only — the synthetic tables
# carry NO reliable unique key: lineitem duplicates (l_orderkey,
# l_linenumber) by design; window totality comes from all-columns
# tiebreaks in _window_order, never from these)
PK = {"region": "r_regionkey", "nation": "n_nationkey", "customer": "c_custkey",
      "supplier": "s_suppkey", "part": "p_partkey", "orders": "o_orderkey",
      "lineitem": "l_linenumber", "events": "event_id", "documents": "doc_id"}
PK_EXTRA = {"lineitem": ["l_orderkey", "l_linenumber"]}

# FK join graph (child table, child col, parent table, parent col)
FKS = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

# low-cardinality string columns: good GROUP BY keys
GROUPABLE = {
    "customer": ["c_mktsegment", "c_nationkey"],
    "supplier": ["s_nationkey"],
    "part": ["p_brand", "p_type", "p_size"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "events": ["event_type"],
    "documents": ["lang", "source"],
    "nation": ["n_regionkey", "n_name"],
    "region": ["r_name"],
}


def profile_tables(sf_dir: str) -> dict:
    """Deterministic literal pools per column: sampled distinct strings,
    numeric/timestamp quantiles. DuckDB-side, once per run."""
    import duckdb

    con = duckdb.connect()
    prof: dict = {}
    for t, cols in TABLES.items():
        con.sql(f"CREATE OR REPLACE VIEW _p AS SELECT * "
                f"FROM '{sf_dir}/{t}.parquet'")
        prof[t] = {}
        for c, kind in cols.items():
            if kind == "s":
                vals = [r[0] for r in con.sql(
                    f"SELECT DISTINCT {c} FROM _p WHERE {c} IS NOT NULL "
                    f"ORDER BY {c} LIMIT 24").fetchall()]
                prof[t][c] = vals
            else:
                # quantile_disc handles TIMESTAMP too (approx_quantile
                # does not); picks actual data values, never interpolates
                q = con.sql(
                    f"SELECT min({c}), quantile_disc({c}, 0.25), "
                    f"quantile_disc({c}, 0.5), quantile_disc({c}, 0.75), "
                    f"max({c}) FROM _p").fetchone()
                prof[t][c] = [v for v in q if v is not None]
    con.close()
    return prof


# ---------------------------------------------------------------- generator


def _sql_str(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


class ShapeGen:
    """One seeded random query shape. Same seed -> byte-identical SQL."""

    KINDS = (
        "filter_agg", "join_agg", "window", "setop",
        "in_subquery", "exists", "projection", "order_limit", "rollup",
        # round-9 breadth extensions
        "time_rollup", "window_frame", "derived_join", "scalar_subquery",
        # the testdata carries ZERO NULLs, so NULL semantics — the classic
        # cross-engine minefield — need deliberate injection (see null_lab)
        "null_lab",
        # round-10 breadth extensions (VERDICT r9 item 5): compositions the
        # registry can't see — deep mixed-type join chains, HAVING over
        # non-selected aggregates, DISTINCT x window, set-ops inside
        # subqueries, and a multibyte/Vietnamese string lab (the testdata
        # is pure ASCII while the engine's domain is Vietnamese)
        "join_chain3", "having_agg", "distinct_window", "setop_subquery",
        "unicode_lab",
        # round-13 breadth extensions: RANGE frames (value-bounded windows
        # with peers-inclusive tie handling) — a physically different
        # window-exec path from the ROWS frames window_frame covers — and
        # offset window functions (lead/lag with explicit defaults,
        # first_value/last_value over explicit frames)
        "range_frame", "offset_window",
    )

    def __init__(self, seed: int, prof: dict, kinds=None):
        self.rng = random.Random(seed)
        self.prof = prof
        self.seed = seed
        self.kinds = tuple(kinds) if kinds else self.KINDS

    # -- leaf pieces -------------------------------------------------------

    def literal(self, t: str, c: str) -> str:
        kind = TABLES[t][c]
        pool = self.prof[t].get(c) or []
        if kind == "s":
            return _sql_str(self.rng.choice(pool)) if pool else "'x'"
        if not pool:
            return "0"
        v = self.rng.choice(pool)
        if kind == "t":
            if isinstance(v, _dt.datetime):
                return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
            return f"TIMESTAMP '{v}'"
        if kind == "f":
            return repr(round(float(v), 4))
        return str(int(v))

    def pred(self, t: str, alias: str, depth: int = 2) -> str:
        cols = list(TABLES[t])
        if depth > 0 and self.rng.random() < 0.45:
            op = self.rng.choice(["AND", "OR"])
            a = self.pred(t, alias, depth - 1)
            b = self.pred(t, alias, depth - 1)
            return f"({a} {op} {b})"
        c = self.rng.choice(cols)
        kind = TABLES[t][c]
        ref = f"{alias}.{c}"
        r = self.rng.random()
        if kind == "s":
            pool = self.prof[t].get(c) or []
            if r < 0.3 and pool:
                n = self.rng.randint(1, min(3, len(pool)))
                vals = ", ".join(_sql_str(v)
                                 for v in self.rng.sample(pool, n))
                return f"{ref} IN ({vals})"
            if r < 0.5 and pool:
                v = str(self.rng.choice(pool))
                cut = max(1, len(v) // 2)
                return f"{ref} LIKE {_sql_str(v[:cut])[:-1]}%'"
            op = self.rng.choice(["=", "<>", "<", ">="])
            return f"{ref} {op} {self.literal(t, c)}"
        op = self.rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{ref} {op} {self.literal(t, c)}"

    def num_expr(self, t: str, alias: str) -> tuple[str, str]:
        """(expr_sql, kind) over numeric columns of t."""
        nums = [c for c, k in TABLES[t].items() if k in ("i", "f")]
        c = self.rng.choice(nums)
        kind = TABLES[t][c]
        ref = f"{alias}.{c}"
        r = self.rng.random()
        if r < 0.45:
            return ref, kind
        if r < 0.62:
            other = self.rng.choice(nums)
            op = self.rng.choice(["+", "-"])
            k = "f" if "f" in (kind, TABLES[t][other]) else "i"
            return f"({ref} {op} {alias}.{other})", k
        if r < 0.72:
            # division — including by columns that CAN be zero: both
            # engines return NULL for x/0 under this engine's pinned
            # non-ANSI confs (verified r9), and int/int is double in both
            other = self.rng.choice(nums)
            return f"({ref} / {alias}.{other})", "f"
        if r < 0.85 and kind == "f":
            lit = round(self.rng.uniform(0.5, 2.0), 2)
            return f"({ref} * {lit})", "f"
        return (f"(CASE WHEN {self.pred(t, alias, 0)} THEN {ref} "
                f"ELSE {self.literal(t, c)} END)"), kind

    def aggs(self, t: str, alias: str, n: int) -> list[str]:
        out = []
        for i in range(n):
            expr, kind = self.num_expr(t, alias)
            fn = self.rng.choice(
                ["count", "sum", "avg", "min", "max", "count_distinct",
                 "stddev_pop"])
            if fn == "count":
                body = "count(*)"
            elif fn == "count_distinct":
                body = f"count(DISTINCT {expr})"
            else:
                body = f"{fn}({expr})"
            # ANSI FILTER clause (round-9 breadth): both engines implement
            # it; a per-aggregate predicate composed with GROUP BY is a
            # shape the frozen registry only exercises via one histogram
            if self.rng.random() < 0.25:
                body += f" FILTER (WHERE {self.pred(t, alias, 0)})"
            needs_round = (
                kind == "f" or fn in ("avg", "stddev_pop")
            ) and fn not in ("count", "count_distinct")
            if needs_round:
                nd = 3 if fn in ("sum", "avg", "stddev_pop") else 4
                out.append(f"round({body}, {nd}) AS agg_{i}")
            else:
                out.append(f"{body} AS agg_{i}")
        return out

    def group_cols(self, t: str, max_n: int = 2) -> list[str]:
        pool = GROUPABLE.get(t, [PK[t]])
        n = self.rng.randint(1, min(max_n, len(pool)))
        return self.rng.sample(pool, n)

    # -- shapes ------------------------------------------------------------

    def gen(self) -> tuple[str, str]:
        # NOTE: seed->shape mapping is stable only within one grammar
        # version — widening KINDS remaps old seeds. Every artifact embeds
        # the full SQL, so historical records stay triageable regardless.
        kind = self.rng.choice(self.kinds)
        return kind, getattr(self, f"_{kind}")()

    def _filter_agg(self) -> str:
        t = self.rng.choice(list(TABLES))
        g = self.group_cols(t)
        aggs = self.aggs(t, "t0", self.rng.randint(1, 3))
        having = ""
        if self.rng.random() < 0.35:
            having = f"\nHAVING count(*) >= {self.rng.randint(1, 5)}"
        gl = ", ".join(f"t0.{c}" for c in g)
        return (
            f"SELECT {gl}, {', '.join(aggs)}\n"
            f"FROM {t} t0\nWHERE {self.pred(t, 't0')}\n"
            f"GROUP BY {gl}{having}"
        )

    def _join_path(self, hops: int):
        """Random FK chain: [(alias, table)], join conditions."""
        fk = self.rng.choice(FKS)
        tables = [(fk[0], "t0"), (fk[2], "t1")]
        conds = [f"t0.{fk[1]} = t1.{fk[3]}"]
        if hops == 2:
            nxt = [f for f in FKS if f[0] == fk[2]]
            if nxt:
                f2 = self.rng.choice(nxt)
                tables.append((f2[2], "t2"))
                conds.append(f"t1.{f2[1]} = t2.{f2[3]}")
        return tables, conds

    def _join_agg(self) -> str:
        tables, conds = self._join_path(self.rng.randint(1, 2))
        jtype = self.rng.choice(["JOIN", "JOIN", "LEFT JOIN", "FULL JOIN"])
        frm = f"FROM {tables[0][0]} {tables[0][1]}"
        for (t, a), cond in zip(tables[1:], conds):
            frm += f"\n{jtype} {t} {a} ON {cond}"
        gt, ga = self.rng.choice(tables)
        g = self.group_cols(gt)
        at, aa = self.rng.choice(tables)
        aggs = self.aggs(at, aa, self.rng.randint(1, 2))
        gl = ", ".join(f"{ga}.{c}" for c in g)
        where = ""
        if self.rng.random() < 0.6:
            wt, wa = self.rng.choice(tables)
            where = f"\nWHERE {self.pred(wt, wa)}"
        return f"SELECT {gl}, {', '.join(aggs)}\n{frm}{where}\nGROUP BY {gl}"

    def _window_order(self, t: str, alias: str) -> str:
        """A TOTAL order: random leading key, then EVERY remaining column
        as pinned-direction tiebreaks. The synthetic tables have no
        reliable unique key (lineitem duplicates (l_orderkey,
        l_linenumber) by design, and sf0.001 even carries one full-FK
        duplicate pair), so per-key tiebreaks leave ROWS frames ambiguous
        between engines — all-columns ordering makes any remaining ties
        full-row-identical, i.e. interchangeable, and the window output
        multiset deterministic."""
        nums = [c for c, k in TABLES[t].items() if k in ("i", "f", "t")]
        c = self.rng.choice(nums)
        d = self.rng.choice(["ASC", "DESC"])
        nf = self.rng.choice(["NULLS FIRST", "NULLS LAST"])
        ties = ", ".join(
            f"{alias}.{k} ASC NULLS FIRST" for k in TABLES[t] if k != c)
        return f"{alias}.{c} {d} {nf}, {ties}"

    def _window(self) -> str:
        t = self.rng.choice([x for x in TABLES if x not in ("region", "nation")])
        part = self.rng.choice(GROUPABLE[t])
        wf = self.rng.choice(
            ["row_number()", "rank()", "dense_rank()", "count(*)"])
        order = self._window_order(t, "t0")
        keys = PK_EXTRA.get(t, [PK[t]])
        # dedupe: the partition col may coincide with a PK tiebreak col
        # (lineitem's l_linenumber); duplicate output names are renamed
        # differently by the two engines (pandas _1 suffix vs dup)
        sel = list(dict.fromkeys(keys + [part]))
        kl = ", ".join(f"t0.{k}" for k in sel)
        return (
            f"SELECT {kl},\n"
            f"       {wf} OVER (PARTITION BY t0.{part} ORDER BY {order}) "
            f"AS wfn\nFROM {t} t0\nWHERE {self.pred(t, 't0')}"
        )

    def _branch_proj(self, t: str) -> tuple[str, str]:
        cols = [c for c, k in TABLES[t].items() if k != "t"]
        n = self.rng.randint(1, min(3, len(cols)))
        proj = self.rng.sample(cols, n)
        return ", ".join(f"t0.{c}" for c in proj), self.pred(t, "t0")

    def _setop(self) -> str:
        t = self.rng.choice(list(TABLES))
        proj, p1 = self._branch_proj(t)
        p2 = self.pred(t, "t0")
        op = self.rng.choice(
            ["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        return (
            f"SELECT {proj} FROM {t} t0 WHERE {p1}\n{op}\n"
            f"SELECT {proj} FROM {t} t0 WHERE {p2}"
        )

    def _in_subquery(self) -> str:
        fk = self.rng.choice(FKS)
        child, ckey, parent, pkey = fk
        neg = "NOT IN" if self.rng.random() < 0.3 else "IN"
        g = self.group_cols(child)
        gl = ", ".join(f"t0.{c}" for c in g)
        return (
            f"SELECT {gl}, count(*) AS agg_0\nFROM {child} t0\n"
            f"WHERE t0.{ckey} {neg} (SELECT t1.{pkey} FROM {parent} t1 "
            f"WHERE {self.pred(parent, 't1')})\nGROUP BY {gl}"
        )

    def _exists(self) -> str:
        fk = self.rng.choice(FKS)
        child, ckey, parent, pkey = fk
        neg = "NOT EXISTS" if self.rng.random() < 0.4 else "EXISTS"
        # correlate parent -> child (semi/anti join on the parent side)
        g = self.group_cols(parent)
        gl = ", ".join(f"t1.{c}" for c in g)
        return (
            f"SELECT {gl}, count(*) AS agg_0\nFROM {parent} t1\n"
            f"WHERE {neg} (SELECT 1 FROM {child} t0 "
            f"WHERE t0.{ckey} = t1.{pkey} AND {self.pred(child, 't0')})\n"
            f"GROUP BY {gl}"
        )

    def _projection(self) -> str:
        t = self.rng.choice(list(TABLES))
        strs = [c for c, k in TABLES[t].items() if k == "s"]
        exprs = [f"t0.{PK[t]}"]
        for c in PK_EXTRA.get(t, [])[:1]:
            if f"t0.{c}" not in exprs:
                exprs.append(f"t0.{c}")
        e, _ = self.num_expr(t, "t0")
        exprs.append(f"{e} AS x0")
        if strs:
            s = self.rng.choice(strs)
            fn = self.rng.choice(
                [f"lower(t0.{s})", f"upper(t0.{s})", f"length(t0.{s})",
                 f"substring(t0.{s}, 1, 3)",
                 f"coalesce(nullif(t0.{s}, {self.literal(t, s)}), '<d>')"])
            exprs.append(f"{fn} AS x1")
        return (f"SELECT {', '.join(exprs)}\nFROM {t} t0\n"
                f"WHERE {self.pred(t, 't0')}")

    def _order_limit(self) -> str:
        t = self.rng.choice(list(TABLES))
        cols = [c for c, k in TABLES[t].items() if k != "t"]
        n = self.rng.randint(2, min(3, len(cols)))
        proj = self.rng.sample(cols, n)
        # ordering by ALL output columns makes LIMIT multiset-deterministic
        order = ", ".join(
            f"{i + 1} {self.rng.choice(['ASC', 'DESC'])} "
            f"{self.rng.choice(['NULLS FIRST', 'NULLS LAST'])}"
            for i in range(n))
        k = self.rng.randint(5, 50)
        pl = ", ".join(f"t0.{c}" for c in proj)
        return (f"SELECT {pl} FROM {t} t0\nWHERE {self.pred(t, 't0')}\n"
                f"ORDER BY {order}\nLIMIT {k}")

    def _time_rollup(self) -> str:
        """date_trunc / extract group-bys — the time-bucket aggregation
        pattern every events pipeline writes; both engines implement the
        ANSI forms identically (Spark date_trunc(fmt, ts), DuckDB
        date_trunc(part, ts) — same spelling for these parts)."""
        t = self.rng.choice(["orders", "lineitem", "events"])
        ts = {"orders": "o_orderdate", "lineitem": "l_shipdate",
              "events": "ts"}[t]
        if self.rng.random() < 0.5:
            part = self.rng.choice(["year", "quarter", "month", "week", "day"])
            key = f"date_trunc('{part}', t0.{ts})"
        else:
            part = self.rng.choice(["year", "quarter", "month", "day"])
            key = f"extract({part} FROM t0.{ts})"
        aggs = self.aggs(t, "t0", self.rng.randint(1, 2))
        return (
            f"SELECT {key} AS tkey, {', '.join(aggs)}\nFROM {t} t0\n"
            f"WHERE {self.pred(t, 't0')}\nGROUP BY {key}"
        )

    def _window_frame(self) -> str:
        """Explicit ROWS frames over a total order — running/trailing
        aggregates. ROWS (not RANGE) + a unique tiebreak makes the frame
        content deterministic; float window sums are rounded in-SQL."""
        t = self.rng.choice([x for x in TABLES if x not in ("region", "nation")])
        part = self.rng.choice(GROUPABLE[t])
        nums = [c for c, k in TABLES[t].items() if k in ("i", "f")]
        c = self.rng.choice(nums)
        order = self._window_order(t, "t0")
        k = self.rng.randint(1, 4)
        frame = self.rng.choice([
            f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN CURRENT ROW AND {k} FOLLOWING",
        ])
        fn = self.rng.choice(["sum", "min", "max", "count"])
        body = f"{fn}(t0.{c})" if fn != "count" else "count(*)"
        w = f"OVER (PARTITION BY t0.{part} ORDER BY {order} {frame})"
        expr = (f"round({body} {w}, 3)"
                if TABLES[t][c] == "f" and fn in ("sum",)
                else f"{body} {w}")
        keys = PK_EXTRA.get(t, [PK[t]])
        sel = list(dict.fromkeys(keys + [part]))  # dedupe vs PK tiebreaks
        kl = ", ".join(f"t0.{x}" for x in sel)
        return (
            f"SELECT {kl}, {expr} AS wfn\nFROM {t} t0\n"
            f"WHERE {self.pred(t, 't0')}"
        )

    def _range_frame(self) -> str:
        """RANGE frames over a single sort key (round 13) — peer rows
        (order-key ties) enter the frame TOGETHER, the classic
        ROWS-vs-RANGE divergence surface, on a physically different
        window-exec path (value-bounded frame scan). Numeric keys take
        numeric offsets, timestamp keys INTERVAL '{k}' DAY; UNBOUNDED
        PRECEDING exercises the peers-inclusive running aggregate. Frame
        content is determined by the key VALUE, not row order, so the
        result is deterministic WITHOUT a tiebreak. SUM sticks to integer
        columns (exact under any accumulation order — a value-bounded
        frame can span a whole partition, where a 3-decimal rounding of a
        float sum no longer absorbs accumulation-order drift); float
        columns are covered via exact MIN/MAX. No explicit NULLS clause:
        the engines' ASC defaults differ, but these shapes run on the
        NULL-free base tables (null injection is null_lab's job)."""
        t = self.rng.choice([x for x in TABLES if x not in ("region", "nation")])
        part = self.rng.choice(GROUPABLE[t])
        oc = self.rng.choice([c for c, k in TABLES[t].items() if k in ("i", "t")])
        k = self.rng.randint(1, 30)
        off = f"INTERVAL '{k}' DAY" if TABLES[t][oc] == "t" else str(k)
        frame = self.rng.choice([
            f"RANGE BETWEEN {off} PRECEDING AND CURRENT ROW",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {off} FOLLOWING",
        ])
        fn = self.rng.choice(["sum", "min", "max", "count"])
        if fn == "sum":
            vals = [c for c, kk in TABLES[t].items() if kk == "i"]
        elif fn == "count":
            vals = [None]
        else:
            vals = [c for c, kk in TABLES[t].items() if kk in ("i", "f")]
        c = self.rng.choice(vals)
        body = "count(*)" if fn == "count" else f"{fn}(t0.{c})"
        d = self.rng.choice(["ASC", "DESC"])
        w = f"OVER (PARTITION BY t0.{part} ORDER BY t0.{oc} {d} {frame})"
        keys_out = PK_EXTRA.get(t, [PK[t]])
        sel = list(dict.fromkeys(keys_out + [part, oc]))
        kl = ", ".join(f"t0.{x}" for x in sel)
        return (
            f"SELECT {kl}, {body} {w} AS wfn\nFROM {t} t0\n"
            f"WHERE {self.pred(t, 't0')}"
        )

    def _offset_window(self) -> str:
        """Offset window functions (round 13): lag/lead with EXPLICIT
        defaults and without (the NULL-vs-default boundary at partition
        edges), plus first_value/last_value over explicit ROWS frames —
        none of the prior window kinds drew the offset-function exec
        path. The _window_order total order makes any remaining ties
        full-row-identical, so the output multiset is deterministic;
        offset results are raw column values (no arithmetic), exact in
        both engines."""
        t = self.rng.choice([x for x in TABLES if x not in ("region", "nation")])
        part = self.rng.choice(GROUPABLE[t])
        order = self._window_order(t, "t0")
        c = self.rng.choice([x for x in TABLES[t] if x != part])
        dflt = {"i": "-1", "f": "-1.0", "s": "'~none~'",
                "t": None}[TABLES[t][c]]
        n = self.rng.randint(1, 3)
        w = f"OVER (PARTITION BY t0.{part} ORDER BY {order})"
        pick = self.rng.random()
        if pick < 0.4 and dflt is not None:
            fn = self.rng.choice(["lag", "lead"])
            expr = f"{fn}(t0.{c}, {n}, {dflt}) {w}"
        elif pick < 0.7:
            fn = self.rng.choice(["lag", "lead"])
            expr = f"{fn}(t0.{c}, {n}) {w}"  # NULL past the edge
        else:
            fv = self.rng.choice(["first_value", "last_value"])
            frame = self.rng.choice([
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
                f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW",
            ])
            expr = (f"{fv}(t0.{c}) OVER (PARTITION BY t0.{part} "
                    f"ORDER BY {order} {frame})")
        keys = PK_EXTRA.get(t, [PK[t]])
        sel = list(dict.fromkeys(keys + [part]))
        kl = ", ".join(f"t0.{k}" for k in sel)
        return (
            f"SELECT {kl}, {expr} AS ofn\nFROM {t} t0\n"
            f"WHERE {self.pred(t, 't0')}"
        )

    def _derived_join(self) -> str:
        """Aggregate-in-FROM joined back to a dimension — the pre-agg
        pattern (and exactly the shape the round-9 top_revenue_orders fix
        rewrote to, so the fuzzer now guards its semantics)."""
        fk = self.rng.choice(FKS)
        child, ckey, parent, pkey = fk
        aggs = self.aggs(child, "c0", 1)
        jtype = self.rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN"])
        g = self.group_cols(parent, 1)
        gl = ", ".join(f"t1.{c}" for c in g)
        where = ""
        if self.rng.random() < 0.5:
            where = f" WHERE {self.pred(child, 'c0')}"
        return (
            f"SELECT {gl}, t1.{pkey} AS pk, d.agg_0\n"
            f"FROM (SELECT c0.{ckey} AS k, {aggs[0]} FROM {child} c0"
            f"{where} GROUP BY c0.{ckey}) d\n"
            f"{jtype} {parent} t1 ON d.k = t1.{pkey}"
        )

    def _nullified(self, t: str, alias: str = "s0",
                   keep_pk: bool = True) -> str:
        """Derived-table twin of ``t`` with deterministic NULL injection:
        each column independently NULLed on a pk-modulus stripe (~1/7 of
        rows per column, different stripes per column). The SAME text runs
        on both engines, so the injection itself can't diverge — only the
        engines' NULL semantics can."""
        pk = PK[t]
        cols = []
        for i, c in enumerate(TABLES[t]):
            if c == pk and keep_pk:
                cols.append(f"{alias}.{c}")
            else:
                cols.append(
                    f"CASE WHEN ({alias}.{pk} + {i}) % 7 = 3 THEN NULL "
                    f"ELSE {alias}.{c} END AS {c}")
        return f"(SELECT {', '.join(cols)} FROM {t} {alias})"

    def _null_lab(self) -> str:
        """NULL-semantics probes over nullified derived tables: NULL group
        keys (one group, ANSI), NULL join keys (never match), NOT IN with
        NULLs in the list (three-valued logic: empty result), null-skipping
        aggregates (count(col) vs count(*), sum/avg), NULLS FIRST/LAST
        ordering with LIMIT, and NULL window partitions."""
        sub = self.rng.choice(["agg", "join", "not_in", "order", "window"])
        if sub == "join":
            child, ckey, parent, pkey = self.rng.choice(FKS)
            # FULL OUTER + NULL keys is the strongest probe here: NULL keys
            # match nothing yet both sides' rows must survive unpaired
            jt = self.rng.choice(["JOIN", "LEFT JOIN", "FULL JOIN"])
            return (
                f"SELECT count(*) AS n_rows, count(d1.{pkey}) AS n_matched\n"
                f"FROM {self._nullified(child, 's0')} d0\n"
                f"{jt} {self._nullified(parent, 's1')} d1 "
                f"ON d0.{ckey} = d1.{pkey}"
            )
        if sub == "not_in":
            child, ckey, parent, pkey = self.rng.choice(FKS)
            neg = "NOT IN" if self.rng.random() < 0.6 else "IN"
            # keep_pk=False: the subquery's key column itself carries NULLs
            # — the ANSI three-valued-logic trap (any NULL in a NOT IN list
            # empties the result)
            return (
                f"SELECT count(*) AS n_rows FROM {child} t0\n"
                f"WHERE t0.{ckey} {neg} "
                f"(SELECT d1.{pkey} FROM "
                f"{self._nullified(parent, 's1', keep_pk=False)} d1)"
            )
        t = self.rng.choice([x for x in TABLES if x != "lineitem"])
        pk = PK[t]
        g = self.rng.choice(GROUPABLE[t])
        nums = [c for c, k in TABLES[t].items()
                if k in ("i", "f") and c != pk]
        num = self.rng.choice(nums) if nums else pk
        rnd = "round({}, 3)" if TABLES[t].get(num) == "f" else "{}"
        if sub == "agg":
            return (
                f"SELECT d0.{g}, count(*) AS n_rows, "
                f"count(d0.{num}) AS n_nonnull, "
                f"{rnd.format(f'sum(d0.{num})')} AS s\n"
                f"FROM {self._nullified(t)} d0\nGROUP BY d0.{g}"
            )
        if sub == "order":
            d = self.rng.choice(["ASC", "DESC"])
            nf = self.rng.choice(["NULLS FIRST", "NULLS LAST"])
            k = self.rng.randint(5, 30)
            # alias both: when t has no numeric column besides its pk,
            # num falls back to pk and an unaliased projection would emit
            # duplicate column names — which the engines' pandas bridges
            # rename DIFFERENTLY (bare dup vs _1 suffix), a harness-side
            # schema mismatch with no data divergence (sf0.1 fuzz seed
            # 42424300099, region)
            return (
                f"SELECT d0.{pk} AS pk, d0.{num} AS v "
                f"FROM {self._nullified(t)} d0\n"
                f"ORDER BY 2 {d} {nf}, 1 ASC\nLIMIT {k}"
            )
        # window: NULL partition key forms its own partition in both
        # engines; pk tiebreak is unique here (lineitem excluded above)
        nf = self.rng.choice(["NULLS FIRST", "NULLS LAST"])
        return (
            f"SELECT d0.{pk}, d0.{g},\n"
            f"       rank() OVER (PARTITION BY d0.{g} "
            f"ORDER BY d0.{num} ASC {nf}, d0.{pk} ASC) AS wfn\n"
            f"FROM {self._nullified(t)} d0"
        )

    def _scalar_subquery(self) -> str:
        """Correlated scalar subquery in the SELECT list — Catalyst's
        RewriteCorrelatedScalarSubquery turns it into an aggregated
        left-outer join; DuckDB decorrelates the same way. Aggregated
        (Spark requires it), so empty matches yield NULL (sum/max) or 0
        (count) identically in both engines."""
        fk = self.rng.choice(FKS)
        child, ckey, parent, pkey = fk
        nums = [c for c, k in TABLES[child].items() if k in ("i", "f")]
        c = self.rng.choice(nums)
        fn = self.rng.choice(["max", "min", "count", "sum"])
        if fn == "count":
            body = "count(*)"
        elif TABLES[child][c] == "f":
            body = f"round({fn}(c0.{c}), 3)"
        else:
            body = f"{fn}(c0.{c})"
        g = self.group_cols(parent, 1)
        gl = ", ".join(f"t1.{x}" for x in g)
        return (
            f"SELECT t1.{pkey} AS pk, {gl},\n"
            f"       (SELECT {body} FROM {child} c0 "
            f"WHERE c0.{ckey} = t1.{pkey} AND {self.pred(child, 'c0', 1)}) "
            f"AS sub\nFROM {parent} t1\nWHERE {self.pred(parent, 't1')}"
        )

    def _rollup(self) -> str:
        t = self.rng.choice([x for x in TABLES if len(GROUPABLE.get(x, [])) >= 2])
        g = self.rng.sample(GROUPABLE[t], 2)
        aggs = self.aggs(t, "t0", 1)
        gl = ", ".join(f"t0.{c}" for c in g)
        return (
            f"SELECT {gl}, {aggs[0]}\nFROM {t} t0\n"
            f"WHERE {self.pred(t, 't0')}\nGROUP BY ROLLUP ({gl})"
        )

    # -- round-10 shapes -----------------------------------------------------

    def _join_chain3(self) -> str:
        """3-4 table FK chains with an independently drawn join type PER
        HOP (mixed INNER/LEFT/RIGHT/FULL). ANSI left-to-right association
        in both engines; outer-padded NULLs flow into group keys (one NULL
        group) and null-skipping aggregates identically."""
        fk = self.rng.choice(FKS)
        chain = [(fk[0], "t0"), (fk[2], "t1")]
        jt = self.rng.choice(["JOIN", "LEFT JOIN", "FULL JOIN"])
        joins = [(jt, fk[2], "t1", f"t0.{fk[1]} = t1.{fk[3]}")]
        for h in range(2, self.rng.randint(3, 4)):
            alias = f"t{h}"
            in_chain = {t for t, _ in chain}
            cands = []
            for c, ck, p, pk2 in FKS:
                for t, a in chain:
                    if t == c and p not in in_chain:
                        cands.append((p, f"{a}.{ck} = {alias}.{pk2}"))
                    if t == p and c not in in_chain:
                        cands.append((c, f"{alias}.{ck} = {a}.{pk2}"))
            if not cands:
                break
            tbl, cond = self.rng.choice(cands)
            jt = self.rng.choice(
                ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
            joins.append((jt, tbl, alias, cond))
            chain.append((tbl, alias))
        frm = f"FROM {chain[0][0]} t0"
        for jt, tbl, al, cond in joins:
            frm += f"\n{jt} {tbl} {al} ON {cond}"
        gt, ga = self.rng.choice(chain)
        g = self.group_cols(gt, 1)[0]
        at, aa = self.rng.choice(chain)
        aggs = self.aggs(at, aa, 1)
        where = ""
        if self.rng.random() < 0.5:
            # filter on the FIRST table only — identical text both engines,
            # and it keeps the outer-join null-padding interplay visible
            where = f"\nWHERE {self.pred(chain[0][0], 't0', 1)}"
        return (
            f"SELECT {ga}.{g} AS gkey, count(*) AS n_rows, {aggs[0]}\n"
            f"{frm}{where}\nGROUP BY {ga}.{g}"
        )

    def _having_agg(self) -> str:
        """HAVING over aggregates beyond count(*), including aggregates
        absent from the SELECT list. Predicates stay on EXACT aggregates
        (counts, integer sums, min/max — single-value selection, no float
        accumulation) so group MEMBERSHIP can never flip on summation
        order; float aggregates still appear in the output, rounded."""
        t = self.rng.choice(list(TABLES))
        g = self.group_cols(t)
        gl = ", ".join(f"t0.{c}" for c in g)
        aggs = self.aggs(t, "t0", self.rng.randint(1, 2))
        ints = [c for c, k in TABLES[t].items() if k == "i"]
        havings = []
        for _ in range(self.rng.randint(1, 2)):
            r = self.rng.random()
            if r < 0.25 or not ints:
                havings.append(f"count(*) >= {self.rng.randint(1, 4)}")
            elif r < 0.5:
                c = self.rng.choice(ints)
                havings.append(f"count(DISTINCT t0.{c}) >= "
                               f"{self.rng.randint(1, 3)}")
            elif r < 0.75:
                c = self.rng.choice(ints)
                op = self.rng.choice([">", "<="])
                havings.append(f"sum(t0.{c}) {op} {self.literal(t, c)}")
            else:
                c = self.rng.choice(list(TABLES[t]))
                op = self.rng.choice([">=", "<"])
                fn = self.rng.choice(["min", "max"])
                havings.append(
                    f"{fn}(t0.{c}) {op} {self.literal(t, c)}")
        glue = self.rng.choice([" AND ", " OR "])
        where = ""
        if self.rng.random() < 0.5:
            where = f"\nWHERE {self.pred(t, 't0', 1)}"
        return (
            f"SELECT {gl}, {', '.join(aggs)}\nFROM {t} t0{where}\n"
            f"GROUP BY {gl}\nHAVING {glue.join(havings)}"
        )

    def _distinct_window(self) -> str:
        """DISTINCT composed with window functions, both nestings: (a)
        DISTINCT over a deterministic window output (optionally filtered
        on the window value — the top-k-per-group idiom), and (b) a window
        computed OVER a DISTINCT derived table (pairs unique -> row_number
        total without extra tiebreaks)."""
        t = self.rng.choice(
            [x for x in TABLES if x not in ("region", "nation")])
        part = self.rng.choice(GROUPABLE[t])
        if self.rng.random() < 0.55:
            wf = self.rng.choice(["rank()", "dense_rank()", "count(*)"])
            order = self._window_order(t, "t0")
            inner = (
                f"SELECT t0.{part} AS gk, {wf} OVER (PARTITION BY "
                f"t0.{part} ORDER BY {order}) AS wfn\n"
                f"  FROM {t} t0 WHERE {self.pred(t, 't0')}"
            )
            filt = (f" WHERE wfn <= {self.rng.randint(1, 5)}"
                    if self.rng.random() < 0.5 else "")
            return f"SELECT DISTINCT gk, wfn FROM (\n{inner}\n) d{filt}"
        nums = [c for c, k in TABLES[t].items() if k in ("i", "f")]
        num = self.rng.choice(nums)
        nf = self.rng.choice(["NULLS FIRST", "NULLS LAST"])
        inner = (
            f"SELECT DISTINCT t0.{part} AS gk, t0.{num} AS v\n"
            f"  FROM {t} t0 WHERE {self.pred(t, 't0')}"
        )
        return (
            f"SELECT gk, v, row_number() OVER (PARTITION BY gk "
            f"ORDER BY v ASC {nf}) AS wfn\nFROM (\n{inner}\n) d"
        )

    def _setop_subquery(self) -> str:
        """Set operations INSIDE subqueries: IN / NOT IN over an
        INTERSECT/EXCEPT/UNION of two key selections, and aggregation over
        a set-op derived table. (Key columns carry no NULLs in the
        testdata, so NOT IN three-valued logic stays with null_lab.)"""
        op = self.rng.choice(["INTERSECT", "EXCEPT", "UNION"])
        if self.rng.random() < 0.5:
            child, ckey, parent, pkey = self.rng.choice(FKS)
            neg = "NOT IN" if self.rng.random() < 0.3 else "IN"
            g = self.group_cols(child)
            gl = ", ".join(f"t0.{c}" for c in g)
            return (
                f"SELECT {gl}, count(*) AS agg_0\nFROM {child} t0\n"
                f"WHERE t0.{ckey} {neg} (\n"
                f"  SELECT t1.{pkey} FROM {parent} t1 "
                f"WHERE {self.pred(parent, 't1', 1)}\n  {op}\n"
                f"  SELECT t2.{pkey} FROM {parent} t2 "
                f"WHERE {self.pred(parent, 't2', 1)}\n)\nGROUP BY {gl}"
            )
        t = self.rng.choice(list(TABLES))
        proj, p1 = self._branch_proj(t)
        p2 = self.pred(t, "t0")
        if op == "UNION" and self.rng.random() < 0.4:
            op = "UNION ALL"
        first = proj.split(", ")[0].split(".")[1]
        return (
            f"SELECT count(*) AS n_rows, count(DISTINCT {first}) AS n_d\n"
            f"FROM (\n  SELECT {proj} FROM {t} t0 WHERE {p1}\n  {op}\n"
            f"  SELECT {proj} FROM {t} t0 WHERE {p2}\n) d"
        )

    # Vietnamese / multibyte literal pool: composed diacritics, the
    # decomposed combining-mark form, uppercase-with-diacritics, CJK, and
    # an astral-plane emoji (UTF-16 surrogate pair on the JVM side). Every
    # function x literal cell and the binary-collation ordering of this
    # exact pool are cross-engine pinned in
    # tests/test_round10_fixes.py::test_unicode_lab_pool_agreement.
    VN_POOL = (
        "bài báo", "tóm tắt", "tiếng Việt", "văn bản dài", "Đà Nẵng",
        "HÀ NỘI", "học máy", "dữ liệu", "ế ẩm", "日本語テキスト",
        "😀 emoji", "café decomposed",
    )

    def _vn_derived(self, t: str, alias: str = "v0") -> tuple[str, int]:
        """Derived table injecting Vietnamese text on pk-modulus stripes —
        same text both engines, so only string SEMANTICS can diverge.
        Returns (sql, n_arms); one arm is NULL ~half the time."""
        pk = PK[t]
        sel = self.rng.sample(self.VN_POOL, self.rng.randint(3, 6))
        arms = " ".join(f"WHEN {i} THEN {_sql_str(s)}"
                        for i, s in enumerate(sel))
        tail = "NULL" if self.rng.random() < 0.5 else _sql_str(
            self.rng.choice(self.VN_POOL))
        return (
            f"(SELECT {alias}.{pk} AS pk, CASE ({alias}.{pk} % "
            f"{len(sel) + 1}) {arms} ELSE {tail} END AS vtxt "
            f"FROM {t} {alias})"
        ), len(sel)

    def _unicode_lab(self) -> str:
        """Multibyte string lab over Vietnamese/CJK/astral literals:
        predicates (=, range, IN, LIKE prefix), GROUP BY, binary-collation
        ORDER BY + LIMIT, and character-semantics functions
        (length/substring/upper/lower/concat) — none of which any
        ASCII-only registry shape can exercise."""
        t = self.rng.choice(["customer", "orders", "documents", "part"])
        d, _n = self._vn_derived(t)
        sub = self.rng.choice(
            ["filter", "group", "order", "funcs", "join", "setop"])
        if sub == "join":
            # multibyte equality as a HASH-JOIN key: two independently
            # striped injections joined on the Vietnamese text itself
            t2 = self.rng.choice(["customer", "orders", "documents"])
            d2, _ = self._vn_derived(t2, "v1")
            jt = self.rng.choice(["JOIN", "LEFT JOIN"])
            return (
                f"SELECT d0.vtxt, count(*) AS n_pairs, "
                f"count(d1.pk) AS n_matched\n"
                f"FROM {d} d0\n{jt} {d2} d1 ON d0.vtxt = d1.vtxt\n"
                f"GROUP BY d0.vtxt"
            )
        if sub == "setop":
            # set-op dedup/membership over multibyte values (NULL rows
            # compare equal in set ops — both engines, ANSI)
            op = self.rng.choice(["UNION", "INTERSECT", "EXCEPT"])
            t2 = self.rng.choice(["customer", "orders", "documents"])
            d2, _ = self._vn_derived(t2, "v1")
            return (
                f"SELECT count(*) AS n_rows, count(vtxt) AS n_v FROM (\n"
                f"  SELECT d0.vtxt FROM {d} d0\n  {op}\n"
                f"  SELECT d1.vtxt FROM {d2} d1\n) u"
            )
        if sub == "filter":
            v = _sql_str(self.rng.choice(self.VN_POOL))
            r = self.rng.random()
            if r < 0.3:
                vals = ", ".join(_sql_str(x) for x in self.rng.sample(
                    self.VN_POOL, self.rng.randint(2, 4)))
                p = f"d0.vtxt IN ({vals})"
            elif r < 0.6:
                full = self.rng.choice(self.VN_POOL)
                cut = max(1, self.rng.randint(1, len(full) - 1))
                p = f"d0.vtxt LIKE {_sql_str(full[:cut])[:-1]}%'"
            else:
                op = self.rng.choice(["=", "<>", "<", ">="])
                p = f"d0.vtxt {op} {v}"
            return (f"SELECT count(*) AS n_rows, count(d0.vtxt) AS n_v\n"
                    f"FROM {d} d0\nWHERE {p}")
        if sub == "group":
            return (
                f"SELECT d0.vtxt, count(*) AS n_rows, "
                f"min(length(d0.vtxt)) AS min_len, "
                f"max(upper(d0.vtxt)) AS max_up\n"
                f"FROM {d} d0\nGROUP BY d0.vtxt"
            )
        if sub == "order":
            dr = self.rng.choice(["ASC", "DESC"])
            nf = self.rng.choice(["NULLS FIRST", "NULLS LAST"])
            k = self.rng.randint(5, 30)
            return (
                f"SELECT d0.pk, d0.vtxt FROM {d} d0\n"
                f"ORDER BY d0.vtxt {dr} {nf}, d0.pk ASC\nLIMIT {k}"
            )
        i = self.rng.randint(1, 3)
        ln = self.rng.randint(1, 5)
        return (
            f"SELECT d0.pk, upper(d0.vtxt) AS up, lower(d0.vtxt) AS lo, "
            f"length(d0.vtxt) AS n_chars, "
            f"substring(d0.vtxt, {i}, {ln}) AS sub, "
            f"d0.vtxt || '_' || coalesce(d0.vtxt, '<n>') AS cc\n"
            f"FROM {d} d0\nWHERE d0.pk % {self.rng.randint(2, 5)} = 0"
        )


# ---------------------------------------------------------------- comparison


def _norm_cell(v):
    """The driver's normalization (tests/test_oracle_parity.py) + datetime
    folding: Spark hands DATE/TIMESTAMP as date/Timestamp objects, DuckDB
    as datetime64 — fold both to 'YYYY-MM-DD HH:MM:SS'."""
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if not math.isfinite(v):
            return repr(v)  # 'inf' / '-inf' — a diff, never a sweep crash
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00"
    return str(v)


def _normalize(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def _decimals(s: str) -> int:
    """Decimal places shown in a normalized numeric string ('516.449' -> 3)."""
    return len(s.rsplit(".", 1)[1]) if "." in s else 0


def _tolerant_equal(srows, orows) -> bool:
    """Strict-mismatch triage: cell-wise with float isclose. Rows re-sorted
    with floats coarsened to 4dp so low-bit jitter can't misalign the sort.

    Two accepted jitter classes: (a) plain isclose (rel 1e-6) for unrounded
    accumulation noise; (b) ROUND-BOUNDARY flips — an in-SQL round(x, d>=3)
    sits on a knife edge where sub-ulp accumulation-order differences
    amplify to exactly one unit in the last place (seed 11111100041:
    round(avg(price*0.57), 3) -> 516.449 vs 516.448). Only values rounded
    to >=3 decimals qualify, only within 1.5 units of the last place, AND
    only when the two values are relatively close (rel 1e-3) — an absolute
    tolerance alone would wave through a 2x divergence on small magnitudes
    (0.001 vs 0.002), so coarse diffs stay loud at every scale."""
    def key(row):
        out = []
        for cell in row:
            try:
                out.append(f"{float(cell):.4f}")
            except (TypeError, ValueError):
                out.append(str(cell))
        return tuple(out)

    if len(srows) != len(orows):
        return False
    for a, b in zip(sorted(srows, key=key), sorted(orows, key=key)):
        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if x == y:
                continue
            try:
                fx, fy = float(x), float(y)
                if math.isclose(fx, fy, rel_tol=1e-6, abs_tol=1e-9):
                    continue
                d = max(_decimals(x), _decimals(y))
                if (d >= 3 and abs(fx - fy) <= 1.5 * 10 ** -d
                        and math.isclose(fx, fy, rel_tol=1e-3)):
                    continue  # round-boundary flip (see docstring)
            except (TypeError, ValueError):
                pass
            return False
    return True


# ------------------------------------------------------- known divergences

def _is_rollup_empty_input(text: str, srows, orows) -> bool:
    """The one divergence class the round-9 nightly run surfaced (4/200
    seeds, triaged + pinned in tests/test_round9_fixes.py): Spark's
    ROLLUP/CUBE/GROUPING SETS return ZERO rows over an empty input, while
    ANSI (and DuckDB/Postgres) require the () grouping set to behave as a
    global aggregate — exactly one grand-total row. The engine ships
    ``operators.ansi_rollup``/``ansi_cube`` wrappers that restore the row.
    Detected narrowly: grouping-set SQL, Spark side empty, DuckDB side
    exactly the grand-total rows (every group key NULL) — anything wider
    stays a loud diff."""
    up = text.upper()
    if not ("ROLLUP" in up or "CUBE" in up or "GROUPING SETS" in up):
        return False
    if srows:
        return False
    # every DuckDB row must be a grouping-set total over zero input rows:
    # group keys NULL and count-ish aggregates 0/NULL
    return bool(orows) and all(
        all(c in ("<null>", "0") for c in row) for row in orows
    )


# ---------------------------------------------------------------- execution


def run_shapes(spark, sf_dir: str, shape_seeds: list[int],
               log=print, kinds=None) -> list[dict]:
    import duckdb

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans.subqueries import (
        _sql,
    )

    prof = profile_tables(sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = []
    for i, seed in enumerate(shape_seeds):
        kind, text = ShapeGen(seed, prof, kinds).gen()
        rec: dict = {"i": i, "seed": seed, "kind": kind, "sql": text}
        try:
            sdf = _sql(spark, sf_dir, text).toPandas()
        except Exception as e:
            rec["status"] = "spark_err"
            rec["error"] = str(e).split("\n")[0][:400]
            results.append(rec)
            log(f"# [{i}] seed={seed} {kind}: SPARK ERROR")
            continue
        try:
            odf = con.sql(text).df()
        except Exception as e:
            rec["status"] = "duck_err"
            rec["error"] = str(e).split("\n")[0][:400]
            results.append(rec)
            log(f"# [{i}] seed={seed} {kind}: DUCKDB ERROR")
            continue
        scols, srows = _normalize(sdf)
        ocols, orows = _normalize(odf)
        rec["rows"] = len(srows)
        if scols != ocols:
            rec["status"] = "diff"
            rec["detail"] = f"columns {scols} vs {ocols}"
        elif len(srows) != len(orows):
            if _is_rollup_empty_input(text, srows, orows):
                rec["status"] = "known_divergence"
                rec["detail"] = "rollup_empty_input (see operators/rollup.py)"
            else:
                rec["status"] = "diff"
                rec["detail"] = f"rowcount {len(srows)} vs {len(orows)}"
        elif srows != orows:
            if _tolerant_equal(srows, orows):
                rec["status"] = "float_jitter"
            else:
                rec["status"] = "diff"
                diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                rec["detail"] = f"values: {diffs}"
        else:
            rec["status"] = "ok"
        if rec["status"] not in ("ok", "float_jitter"):
            log(f"# [{i}] seed={seed} {kind}: {rec['status']} "
                f"{rec.get('detail', '')[:160]}")
        results.append(rec)
    con.close()
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=9001)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                                           "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=None,
                    help="result file; defaults to fuzz_last.json (the "
                         "committed nightly artifact) for full runs, but "
                         "fuzz_replay.json in --replay mode so a triage "
                         "replay can never clobber the nightly record")
    ap.add_argument("--replay", type=int, nargs="*", default=None,
                    help="re-run exactly these shape seeds (triage mode)")
    ap.add_argument("--kinds", nargs="*", default=None,
                    help="restrict generation to these grammar kinds (new-"
                         "shape shakedown); a --replay of a --kinds run "
                         "must pass the SAME --kinds to regenerate the "
                         "same shapes")
    args = ap.parse_args()
    if args.out is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        args.out = os.path.join(
            repo, "fuzz_replay.json" if args.replay else "fuzz_last.json")

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark

    spark = get_spark(app_name="vlds-fuzz")
    seeds = (args.replay if args.replay
             else [args.seed * 100_000 + i for i in range(args.n)])
    if args.kinds:
        bad = [k for k in args.kinds if k not in ShapeGen.KINDS]
        if bad:
            ap.error(f"unknown kinds {bad}; valid: {list(ShapeGen.KINDS)}")
    results = run_shapes(spark, args.sf_dir, seeds,
                         log=lambda m: print(m, file=sys.stderr),
                         kinds=args.kinds)

    counts: dict = {}
    for r in results:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    summary = {
        "master_seed": args.seed, "n": len(results), "sf_dir": args.sf_dir,
        "counts": counts,
        "failures": [r for r in results
                     if r["status"] not in ("ok", "float_jitter",
                                            "known_divergence")],
        "known_divergences": [
            {"seed": r["seed"], "detail": r["detail"]}
            for r in results if r["status"] == "known_divergence"
        ],
        # jitter stays visible: every seed the tolerant comparator absorbed,
        # so a tolerance bug can be audited from the artifact alone
        "float_jitter_seeds": [r["seed"] for r in results
                               if r["status"] == "float_jitter"],
        "kinds": sorted({r["kind"] for r in results}),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "shapes": results}, f, indent=1)
        f.write("\n")
    print(json.dumps(summary["counts"]))
    print(f"# {len(results)} shapes -> {args.out}", file=sys.stderr)
    if summary["failures"]:
        print(f"# {len(summary['failures'])} FAILURES — triage with "
              f"--replay <seed>", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
