"""Summarization-pipeline topology against PLANTED ground truth (round 13).

The five pipeline flagships are oracle-green on fixed testdata, but chunk
counts, collapse round counts, fold order, critique trigger behavior, and
tree-collapse order all have closed forms given (doc length, chunk_size,
chunk_overlap, token_max) and the deterministic mock summarizer (VERDICT
r12 item 2). This harness fuzzes random configs x corpora of globally
unique tokens and checks every pipeline against a PURE-PYTHON replay
derived from the REFERENCE's documented semantics — the splitter contract
(run_full_evaluation_pipeline.py:356-361: langchain separator hierarchy,
token-budget merge, overlap carry + shed), the greedy packing / collapse
recurrence (runners/run_summarization_ollama_mapreduce.py:119-154), the
critique flow (CR:224-265: [PHẦN i] tagging, stop phrase, refine-once),
and the tree walk (HI:232-313). The replay is INDEPENDENTLY TYPED from
the reference's documented semantics but structurally mirrors the same
algorithm the engine implements, so a shared algorithmic misreading
would pass both — the genuinely construction-independent anchors are the
closed forms: the space-only chunk-count formula (family 1, which caught
the real pre-r13 overlap bug) and the multi-separator paragraph plants
(family 1b: exact-fit and pair-merge '\n\n' documents whose expected
chunk strings are assembled literally from the construction).

Per seeded corpus (deterministic ``random.Random(seed)``, config drawn per
seed: chunk_size C, overlap V, mock width K, token_max X >= 2K):

1. CHUNK CLOSED FORM — a space-only doc of N unique tokens splits into
   exactly m = 1 if N <= C else 1 + ceil((N - C) / (C - V)) chunks; chunk
   i is literally tokens[i*(C-V) : i*(C-V)+C] (last short). Asserted
   directly from the formula (no replay involved) for `chunk_documents`,
   and ceil(N/C) fixed windows for `chunk_fixed_tokens`.
2. COLLAPSE RECURRENCE — `collapse_until_fits` over PLANTED (chunk_idx,
   text, n_tokens) rows: reported stats["rounds"] and the output rows must
   equal the Python recurrence (greedy pack -> mock-reduce until the doc
   total fits), identically under repartition(3) vs repartition(11).
3. MAP-REDUCE — `mapreduce_summarize` equals the replay end-to-end
   (multi-round docs, single-chunk docs, and the empty doc -> '').
4. ITERATIVE FOLD ORDER — `iterative_refine_summarize` equals the
   left-to-right fold replay; K > C makes the summary absorb several
   chunks in order, so any fold-order scramble changes the token sequence.
   Checked under repartition(3) vs (11).
5. TRUNCATED — truncate-then-mock closed form.
6. CRITIQUE — `mapreduce_critique_summarize` equals the replay: [PHẦN i]
   tagging survives into the mock output (alignment is literal string
   equality), MockCritic's odd/even-token stop phrase decides refine
   vs accept, iteration caps respected; replay counts both branches.
7. HIERARCHICAL — `hierarchical_summarize` equals the bottom-up tree
   replay: deepest-level headers collapse first, descendant paragraphs
   gather in node_id (document) order, empty-body headers keep the bare
   title (F8), header-less docs skip the loop, a paragraph-free tree
   yields '' — plus the final gather + polish pass.

    python examples/fuzz_pipeline_planted.py [--seeds 20]
                                             [--out fuzz_pipeline_last.json]

tests/test_fuzz_pipeline_planted.py runs a 2-seed slice per session.
"""

from __future__ import annotations

import argparse
import itertools
import json
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEPARATORS = ("\n\n", "\n", ".", "!", "?", ";", " ", "")


class _Vocab:
    def __init__(self, seed: int) -> None:
        self._c = itertools.count()
        self._seed = seed

    def fresh(self, k: int) -> list[str]:
        return [f"w{self._seed}x{next(self._c)}" for _ in range(k)]


# --- pure-Python replay of the reference semantics ----------------------

def py_mock(text: str, k: int) -> str:
    """MockSummarizer: first k whitespace tokens, space-rejoined."""
    return " ".join((text or "").split()[:k])


def _wslen(t: str) -> int:
    return len(t.split())


def _split_on(text: str, sep: str) -> list[str]:
    if sep == "":
        return list(text)
    parts = text.split(sep)
    return [p + sep if i < len(parts) - 1 else p
            for i, p in enumerate(parts) if (p + sep if i < len(parts) - 1 else p)]


def _py_merge(pieces: list[str], C: int, V: int) -> list[str]:
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for piece in pieces:
        plen = _wslen(piece)
        if cur and cur_len + plen > C:
            chunks.append(" ".join(cur).strip())
            if V > 0:
                keep: list[str] = []
                klen = 0
                for prev in reversed(cur):
                    pl = _wslen(prev)
                    if klen + pl > V:
                        break
                    keep.insert(0, prev)
                    klen += pl
                while keep and klen + plen > C:
                    klen -= _wslen(keep.pop(0))
                cur, cur_len = keep, klen
            else:
                cur, cur_len = [], 0
        cur.append(piece)
        cur_len += plen
    if cur:
        chunks.append(" ".join(cur).strip())
    return [c for c in chunks if c]


def py_recursive_split(text: str, C: int, V: int,
                       seps: tuple[str, ...] = SEPARATORS) -> list[str]:
    """First-principles replay of the reference splitter contract
    (langchain RecursiveCharacterTextSplitter semantics at the token
    level): the active separator is the first one PRESENT in the text;
    runs of small pieces greedy-merge to <= C tokens carrying <= V tokens
    of lookback (shedding retained overlap until the incoming piece
    fits); an oversized piece recurses with the remaining separators and
    the SAME overlap, its sub-chunks emitted in place."""
    if _wslen(text) <= C:
        t = text.strip()
        return [t] if t else []
    sep = ""
    rest: tuple[str, ...] = ()
    for i, s in enumerate(seps):
        if s == "":
            break
        if s in text:
            sep = s
            rest = seps[i + 1:]
            break
    chunks: list[str] = []
    good: list[str] = []
    for part in _split_on(text, sep):
        piece = part.strip() if sep != "" else part
        if not piece:
            continue
        if _wslen(piece) <= C:
            good.append(piece)
        else:
            if good:
                chunks.extend(_py_merge(good, C, V))
                good = []
            if not rest:
                chunks.append(piece)
            else:
                chunks.extend(py_recursive_split(piece, C, V, rest))
    if good:
        chunks.extend(_py_merge(good, C, V))
    return [c for c in chunks if c]


def closed_form_chunks(tokens: list[str], C: int, V: int) -> list[list[str]]:
    """Space-only unique-token docs: chunk i = tokens[i*(C-V) : i*(C-V)+C],
    m = 1 if N <= C else 1 + ceil((N-C)/(C-V)). Derived from the merge
    semantics by hand — the anchor that keeps py_recursive_split honest."""
    n = len(tokens)
    if n <= C:
        return [tokens] if tokens else []
    s = C - V
    m = 1 + math.ceil((n - C) / s)
    return [tokens[i * s : i * s + C] for i in range(m)]


def py_greedy(ntoks: list[int], X: int) -> list[int]:
    """Reference split_list_of_docs: new group when a NON-EMPTY group would
    overflow; an oversize chunk alone keeps its own group."""
    gids, gid, acc = [], 0, 0
    for t in ntoks:
        if acc > 0 and acc + t > X:
            gid += 1
            acc = t
        else:
            acc += t
        gids.append(gid)
    return gids


def replay_collapse(rows: list[tuple[int, str]], K: int, X: int,
                    max_rounds: int = 10) -> tuple[list[tuple[int, str]], int]:
    """collapse_until_fits recurrence over one doc's (chunk_idx, text)
    rows. Returns (final rows, rounds)."""
    rows = sorted(rows)
    rounds = 0
    while rounds < max_rounds and sum(_wslen(t) for _, t in rows) > X:
        gids = py_greedy([_wslen(t) for _, t in rows], X)
        nxt: list[tuple[int, str]] = []
        for gid in sorted(set(gids)):
            members = [t for (_, t), g in zip(rows, gids) if g == gid]
            nxt.append((gid, py_mock("\n\n".join(members), K)))
        rows = nxt
        rounds += 1
    return rows, rounds


def replay_mapreduce(text: str, C: int, V: int, K: int, X: int,
                     max_rounds: int = 10) -> str:
    chunks = py_recursive_split(text or "", C, V)
    if not chunks:
        return ""
    rows = [(i, py_mock(c, K)) for i, c in enumerate(chunks)]
    rows, _ = replay_collapse(rows, K, X, max_rounds)
    return py_mock("\n\n".join(t for _, t in sorted(rows)), K)


def replay_iterative(text: str, C: int, V: int, K: int) -> str:
    chunks = py_recursive_split(text or "", C, V)
    summary = ""
    for c in chunks:
        summary = py_mock(c, K) if not summary else py_mock(summary + "\n\n" + c, K)
    return summary


def replay_truncated(text: str, K: int, max_in: int) -> str:
    toks = (text or "").split()
    inp = " ".join(toks[:max_in]) if len(toks) > max_in else (text or "")
    return py_mock(inp, K)


def _py_critique_reduce(texts: list[str], origs: list[str], K: int,
                        iteration: int, max_crit: int,
                        counts: dict) -> str:
    tagged = "\n\n".join(f"[PHẦN {i + 1}]\n{t or ''}" for i, t in enumerate(texts))
    initial = py_mock(tagged, K)
    if iteration >= max_crit:
        counts["capped"] += 1
        return initial
    # MockCritic: even token count -> stop phrase, odd -> refine
    if _wslen(initial) % 2 == 0:
        counts["accepted"] += 1
        return initial
    counts["refined"] += 1
    return "[refined] " + initial


def replay_critique(docs: dict, C: int, V: int, K: int, X: int,
                    max_crit: int = 2, max_rounds: int = 15,
                    counts: dict | None = None) -> dict:
    """Corpus-level replay: the engine's ``iteration`` counter is GLOBAL —
    the collapse loop runs while ANY doc is over budget, and the
    pre-collapse/final reduces see the post-loop count for EVERY doc (a
    small doc next to a huge one is critiqued at a later iteration than it
    would be alone). Input/output keyed by doc id."""
    counts = counts if counts is not None else {"refined": 0, "accepted": 0, "capped": 0}
    state: dict = {}
    for i, text in docs.items():
        chunks = py_recursive_split(text or "", C, V)
        # rows: (idx, text, orig); level-1 critique reference = the chunks
        state[i] = [(j, py_mock(c, K), c) for j, c in enumerate(chunks)]

    def total(rows) -> int:
        return sum(_wslen(t) for _, t, _ in rows)

    def level(rows, budget, iteration):
        gids = py_greedy([_wslen(t) for _, t, _ in rows], budget)
        out = []
        for gid in sorted(set(gids)):
            g = [(t, o) for (_, t, o), gg in zip(rows, gids) if gg == gid]
            red = _py_critique_reduce([t for t, _ in g], [o for _, o in g],
                                      K, iteration, max_crit, counts)
            out.append((gid, red, red))  # later levels critique the summaries
        return out

    iteration = 0
    while iteration < max_rounds and any(total(r) > X for r in state.values()):
        state = {i: level(sorted(r), X, iteration) if total(r) > X else r
                 for i, r in state.items()}
        iteration += 1
    half = X // 2
    if any(total(r) > half for r in state.values()):
        state = {i: level(sorted(r), half, iteration) if total(r) > half else r
                 for i, r in state.items()}
    out = {}
    for i, rows in state.items():
        if not rows:
            out[i] = ""
            continue
        final = level(sorted(rows), 2**31 - 1, iteration)
        assert len(final) == 1
        out[i] = final[0][1]
    return out


def _flatten_tree(node: dict) -> list[dict]:
    rows, nid = [], 0
    stack = [(node, None, 0, [])]
    while stack:
        n, parent, depth, path = stack.pop()
        rows.append({"node_id": nid, "parent_id": parent, "depth": depth,
                     "node_type": n.get("type", "Paragraph"),
                     "text": n.get("text", ""), "path": list(path)})
        child_path = path + [nid]
        for ch in reversed(n.get("children", [])):
            stack.append((ch, nid, depth + 1, child_path))
        nid += 1
    return rows


def replay_hierarchical(tree: dict, C: int, V: int, K: int, X: int,
                        max_depth: int = 2, polish: bool = True) -> str:
    nodes = _flatten_tree(tree)
    non_para = [n["depth"] for n in nodes if n["node_type"] != "Paragraph"]
    actual = max(non_para) if non_para else 0
    for d in range(min(max_depth, actual), 0, -1):
        targets = [n for n in nodes if n["depth"] == d and n["node_type"] != "Paragraph"]
        if not targets:
            continue
        tids = {t["node_id"] for t in targets}
        replaced = []
        for t in targets:
            paras = sorted(
                (n for n in nodes
                 if n["node_type"] == "Paragraph" and t["node_id"] in n["path"]),
                key=lambda n: n["node_id"])
            body = "\n\n".join(p["text"] or "" for p in paras)
            title = (t["text"] or "").strip()
            if body.strip() == "":
                new_text = title
            else:
                sec = f"{title}\n\n{body}" if title != "" else body
                summ = replay_mapreduce(sec, C, V, K, X)
                new_text = f"{title}:\n{summ}" if title != "" else summ
            replaced.append({**t, "node_type": "Paragraph", "text": new_text})
        nodes = [n for n in nodes
                 if n["node_id"] not in tids and not (set(n["path"]) & tids)]
        nodes.extend(replaced)
    paras = sorted((n for n in nodes if n["node_type"] == "Paragraph"),
                   key=lambda n: n["node_id"])
    if not paras:
        return ""
    doc_text = "\n\n".join(p["text"] or "" for p in paras)
    summary = replay_mapreduce(doc_text, C, V, K, X)
    return py_mock(summary, K) if polish else summary


# --- corpus construction + engine comparison ----------------------------

def _build_tree(vb: _Vocab, rng: random.Random, C: int) -> dict:
    def para() -> dict:
        return {"type": "Paragraph", "text": " ".join(vb.fresh(rng.randint(3, C)))}

    headers = []
    for _ in range(rng.randint(1, 3)):
        kids: list[dict] = [para() for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.6:  # nested header at depth 2
            kids.append({"type": "Header", "text": " ".join(vb.fresh(2)),
                         "children": [para() for _ in range(rng.randint(1, 2))]})
        headers.append({"type": "Header", "text": " ".join(vb.fresh(rng.randint(1, 3))),
                        "children": kids})
    headers.append({"type": "Header", "text": " ".join(vb.fresh(2)),
                    "children": []})  # empty-body guard (F8): bare title kept
    children = headers + [para()]  # a root-level paragraph
    rng.shuffle(children)
    return {"type": "Root", "text": "", "children": children}


def check_corpus(spark, seed: int) -> dict:
    from pyspark.sql import functions as F

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.chunking import (
        chunk_documents,
        chunk_fixed_tokens,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.collapse import (
        collapse_until_fits,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize import (
        MockSummarizer,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.approaches import (
        iterative_refine_summarize,
        mapreduce_summarize,
        truncated_summarize,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.critique import (
        mapreduce_critique_summarize,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.summarize.hierarchical import (
        hierarchical_summarize,
    )

    rng = random.Random(seed)
    vb = _Vocab(seed)
    violations: list[str] = []

    C = rng.randint(6, 12)
    V = rng.randint(0, min(3, C - 2))
    K = rng.randint(4, 8)
    X = rng.randint(2 * K, 3 * K)
    mock = MockSummarizer(K)

    # docs: multi-round, boundary N = C (single chunk), N = C+1, short,
    # empty, whitespace-only
    sizes = [rng.randint(8 * C, 16 * C), rng.randint(2 * C, 4 * C), C, C + 1,
             rng.randint(1, C - 1)]
    docs = [(i, " ".join(vb.fresh(n))) for i, n in enumerate(sizes)]
    docs.append((90, ""))
    docs.append((91, "   "))
    docs_df = spark.createDataFrame(docs, "doc_id long, text string")

    # 1. chunk closed form (space-only docs — formula, not replay)
    got_chunks: dict[int, list[tuple[int, str, int]]] = {}
    for r in chunk_documents(docs_df, C, V).collect():
        got_chunks.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk"], r["n_tokens"]))
    for doc_id, text in docs:
        toks = text.split()
        want = closed_form_chunks(toks, C, V)
        got = [c for _, c, _ in sorted(got_chunks.get(doc_id, []))]
        if got != [" ".join(w) for w in want]:
            violations.append(
                f"chunk/doc{doc_id}: got {len(got)} chunks, want "
                f"{len(want)} — first diff "
                f"{next((a, b) for a, b in zip(got + [None], [' '.join(w) for w in want] + [None]) if a != b)}")
        for (idx, c, nt), w in zip(sorted(got_chunks.get(doc_id, [])), want):
            if nt != len(w):
                violations.append(f"chunk/doc{doc_id}#{idx}: n_tokens {nt} != {len(w)}")
        # replay must agree with the closed form on this input class
        if py_recursive_split(text, C, V) != [" ".join(w) for w in want]:
            violations.append(f"replay/doc{doc_id}: py split != closed form")

    # 1b. multi-separator closed form (the '\n\n' path) — expected chunk
    # strings assembled literally from the paragraph construction, no
    # replay involved (the replay mirrors the reference algorithm, so
    # only construction-level plants are independent of it here):
    # exact-fit paragraphs of exactly C tokens each occupy one chunk
    # apiece for ANY overlap V < C (the C-token piece can never be
    # retained as overlap); per the documented merge contract each split
    # piece is stripped and merged chunks are space-joined
    k_ex = rng.randint(2, 4)
    paras_ex = [" ".join(vb.fresh(C)) for _ in range(k_ex)]
    sep_docs = [(200, "\n\n".join(paras_ex))]
    want_sep: dict[int, list[str]] = {200: list(paras_ex)}
    # pair-merge paragraphs: W tokens with 2W <= C < 3W and W > V, so
    # chunks are consecutive pairs space-joined "Pi Pj" (odd tail alone)
    # — pieces are stripped of their separator and merged with ' ' per
    # the splitter's documented merge convention
    W = C // 2
    if W > V:
        k_pm = rng.randint(4, 6)
        paras_pm = [" ".join(vb.fresh(W)) for _ in range(k_pm)]
        sep_docs.append((201, "\n\n".join(paras_pm)))
        pairs = [paras_pm[j:j + 2] for j in range(0, k_pm, 2)]
        want_sep[201] = [" ".join(p) for p in pairs]
    sep_df = spark.createDataFrame(sep_docs, "doc_id long, text string")
    got_sep: dict[int, list[tuple[int, str, int]]] = {}
    for r in chunk_documents(sep_df, C, V).collect():
        got_sep.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk"], r["n_tokens"]))
    for doc_id, want_list in want_sep.items():
        got_list = [c for _, c, _ in sorted(got_sep.get(doc_id, []))]
        if got_list != want_list:
            violations.append(
                f"chunk-sep/doc{doc_id}: got {got_list!r} != {want_list!r}")
        for (_, c, nt) in sorted(got_sep.get(doc_id, [])):
            if nt != len(c.split()):
                violations.append(
                    f"chunk-sep/doc{doc_id}: n_tokens {nt} != {len(c.split())}")

    fixed = {}
    for r in chunk_fixed_tokens(docs_df, C).collect():
        fixed.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    for doc_id, text in docs:
        n = len(text.split())
        m = max(1, math.ceil(n / C))
        sizes_want = [C] * (m - 1) + [n - (m - 1) * C]
        got = [t for _, t in sorted(fixed.get(doc_id, []))]
        if got != sizes_want:
            violations.append(
                f"fixed/doc{doc_id}: chunk sizes {got} want {sizes_want}")

    # 2. collapse recurrence over planted rows (multi-doc, 2 partitionings)
    planted_rows = []
    want_rows: dict[int, list[tuple[int, str]]] = {}
    want_rounds = 0
    for doc_id in (0, 1, 2):
        n_rows = rng.randint(2, 12)
        rows = [(i, " ".join(vb.fresh(rng.randint(1, K + 2))))
                for i in range(n_rows)]
        for i, t in rows:
            planted_rows.append((doc_id, i, t, _wslen(t)))
        want_rows[doc_id], r = replay_collapse(rows, K, X)
        want_rounds = max(want_rounds, r)
    pdf = spark.createDataFrame(
        planted_rows, "doc_id long, chunk_idx int, text string, n_tokens int")
    for parts in (3, 11):
        stats: dict = {}
        out = collapse_until_fits(pdf.repartition(parts), mock, X, stats=stats)
        got: dict[int, list[tuple[int, str]]] = {}
        for r in out.collect():
            got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["text"]))
        got = {k: sorted(v) for k, v in got.items()}
        if got != want_rows:
            violations.append(f"collapse/p{parts}: rows != replay ({got} vs {want_rows})")
        if stats["rounds"] != want_rounds:
            violations.append(
                f"collapse/p{parts}: rounds {stats['rounds']} != replay {want_rounds}")

    # 3-6. the four flat pipelines vs replay
    max_in = rng.randint(C, 4 * C)
    crit_counts = {"refined": 0, "accepted": 0, "capped": 0}
    expect = {
        "mapreduce": {i: replay_mapreduce(t, C, V, K, X) for i, t in docs},
        "iterative": {i: replay_iterative(t, C, V, K) for i, t in docs},
        "truncated": {i: replay_truncated(t, K, max_in) for i, t in docs},
        "critique": replay_critique(dict(docs), C, V, K, X, counts=crit_counts),
    }
    runs = {
        "mapreduce": lambda d: mapreduce_summarize(d, mock, C, V, X),
        "iterative": lambda d: iterative_refine_summarize(d, mock, C, V),
        "truncated": lambda d: truncated_summarize(d, mock, max_in),
        "critique": lambda d: mapreduce_critique_summarize(
            d, mock, chunk_size=C, chunk_overlap=V, token_max=X),
    }
    for name, fn in runs.items():
        parts_out = {}
        for parts in (3, 11):
            got = {r["doc_id"]: r["summary"]
                   for r in fn(docs_df.repartition(parts)).collect()}
            parts_out[parts] = got
            for i, _ in docs:
                if got.get(i) != expect[name][i]:
                    violations.append(
                        f"{name}/p{parts}/doc{i}: {got.get(i)!r} != "
                        f"{expect[name][i]!r}")
        if parts_out[3] != parts_out[11]:
            violations.append(f"{name}: output depends on partitioning")

    # [PHẦN i] alignment is literal: the replay's critique summaries carry
    # the markers, and string equality above pinned them — but require the
    # plant actually produced one, so the check can't silently go vacuous
    if not any("[PHẦN" in s for s in expect["critique"].values()):
        violations.append("critique: no [PHẦN i] marker in any expected summary")

    # 7. hierarchical vs tree replay
    trees = [(f"doc{j}", _build_tree(vb, rng, C)) for j in range(3)]
    trees.append(("empty", {"type": "Root", "text": "", "children": []}))
    tdf = spark.createDataFrame(
        [(i, json.dumps(t)) for i, t in trees], "doc_id string, tree_json string")
    got_h = {r["doc_id"]: r["summary"]
             for r in hierarchical_summarize(tdf, mock, chunk_size=C,
                                             chunk_overlap=V, token_max=X).collect()}
    for doc_id, tree in trees:
        want = replay_hierarchical(tree, C, V, K, X)
        if got_h.get(doc_id) != want:
            violations.append(
                f"hierarchical/{doc_id}: {got_h.get(doc_id)!r} != {want!r}")

    return {
        "seed": seed,
        "config": {"C": C, "V": V, "K": K, "X": X, "max_in": max_in},
        "collapse_rounds": want_rounds,
        "critique_branches": crit_counts,
        "violations": violations,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fuzz_pipeline_last.json"))
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import (
        get_spark,
    )

    spark = get_spark(app_name="vlds-fuzz-pipeline", shuffle_partitions=8)
    records = []
    for seed in range(args.seeds):
        rec = check_corpus(spark, seed)
        records.append(rec)
        status = "ok" if not rec["violations"] else "VIOLATIONS"
        print(f"# seed {seed}: {status} cfg={rec['config']} "
              f"rounds={rec['collapse_rounds']} crit={rec['critique_branches']}",
              file=sys.stderr)
    bad = [r for r in records if r["violations"]]
    summary = {
        "seeds": args.seeds,
        "violations_total": sum(len(r["violations"]) for r in records),
        "max_collapse_rounds": max(r["collapse_rounds"] for r in records),
        "critique_refined_total": sum(r["critique_branches"]["refined"] for r in records),
        "critique_accepted_total": sum(r["critique_branches"]["accepted"] for r in records),
        "critique_capped_total": sum(r["critique_branches"]["capped"] for r in records),
        "failing_seeds": [r["seed"] for r in bad],
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "records": records}, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
