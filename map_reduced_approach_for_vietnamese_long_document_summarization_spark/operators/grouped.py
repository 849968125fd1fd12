"""Batched per-key apply: the scale path for "one Python call per group".

``DataFrame.groupBy(key).applyInPandas(fn)`` pays per-GROUP overhead — one
Arrow slice + pandas DataFrame construction + Python invocation per key. For
corpora where groups are tiny and numerous (millions of documents, a handful
of chunks each), that overhead dominates: at sf0.1 the iterative-refine fold
spent ~10s of its 11s wall on it. ``grouped_apply_sorted`` keeps the exact
same semantics (all rows of a key on one task, presented in a deterministic
order) but amortizes the Python/Arrow machinery across a whole partition:

    repartition(key) -> sortWithinPartitions(key, order) -> mapInPandas

so each task streams Arrow batches, walks contiguous key runs, and invokes
the per-group function as plain Python over already-sorted row tuples —
carrying the in-progress group across Arrow batch boundaries. One shuffle
(same as applyInPandas), O(partitions) Python/Arrow setups instead of
O(groups). Measured ~9x faster on 5000 docs x 1.4 chunks (1.3s vs 11.5s).

Used by ``summarize.approaches.iterative_refine_summarize`` (D11) and
``summarize.critique._critique_collapse_level`` (D9/D10).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GroupFn = Callable[[tuple, list[tuple]], Iterable[tuple]]


def grouped_apply_sorted(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_col: str,
    fn: GroupFn,
    schema: T.StructType,
    num_partitions: int | None = None,
    flush_rows: int = 256,
) -> DataFrame:
    """Apply ``fn(key, rows)`` once per distinct ``key_cols`` value.

    ``rows`` is the group's rows as tuples in ``df.columns`` order, sorted by
    ``order_col`` (ties broken by the shuffle's stable within-key order — add
    a tiebreaker column to ``order_col``'s upstream if full determinism per
    row is needed; every current caller reduces over the sorted order, so
    order_col uniqueness suffices). ``fn`` returns an iterable of output
    tuples matching ``schema``.

    Semantics are identical to ``groupBy(*key_cols).applyInPandas`` with an
    in-function sort: the hash repartition co-locates each key on one task
    and the partition sort makes key runs contiguous. Like applyInPandas, one
    group's rows are materialized in memory at a time — groups must fit on a
    task (thousands of chunks per doc, not billions).
    """
    in_cols = list(df.columns)
    parted = df.repartition(num_partitions, *key_cols) if num_partitions else df.repartition(*key_cols)
    parted = parted.sortWithinPartitions(*key_cols, order_col)
    out_names = [f.name for f in schema.fields]
    key_idx = [in_cols.index(k) for k in key_cols]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key: tuple | None = None
        rows: list[tuple] = []
        done: list[tuple] = []
        for pdf in batches:
            for row in zip(*(pdf[c] for c in in_cols)):
                # normalize missing key values to None: pandas renders a
                # NULL numeric key as NaN, and NaN != NaN would fragment
                # the group into one fn() call per row
                key = tuple(
                    None if (v is None or (isinstance(v, float) and v != v)) else v
                    for v in (row[i] for i in key_idx)
                )
                if key != cur_key:
                    if cur_key is not None:
                        done.extend(fn(cur_key, rows))
                    rows = []
                    cur_key = key
                rows.append(row)
            if len(done) >= flush_rows:
                yield pd.DataFrame(done, columns=out_names)
                done = []
        if cur_key is not None:
            done.extend(fn(cur_key, rows))
        if done:
            yield pd.DataFrame(done, columns=out_names)

    return parted.mapInPandas(run, schema)
