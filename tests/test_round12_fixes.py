"""Round-12 regression pins.

1. ADVICE r11: the flood-closure convergence guard in plans/clusters.py must
   fire for EVERY consumer of ``comp`` — including ``SELECT count(*)``,
   which column-prunes ``cluster_id`` and (in the r11 formulation) silently
   elided the ``error()`` CASE. The guard now gates comp's ROWS on the
   erroring ``conv`` aggregate, which no projection pruning can remove.
"""

import duckdb
import pytest

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans.clusters import (
    _closure_sql,
)


def _chain_con(n: int) -> duckdb.DuckDBPyConnection:
    """documents 0..n-1 linked in a path graph (diameter n-1)."""
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents AS SELECT range AS doc_id FROM range({n})")
    con.execute(
        f"CREATE TABLE simpairs AS SELECT range AS id1, range + 1 AS id2 "
        f"FROM range({n - 1})"
    )
    return con


def test_too_shallow_depth_errors_even_under_count_star():
    """A 10-node path needs 9 flood rounds; depth 1 must fail LOUDLY for a
    consumer that never reads cluster_id (the pruning hole ADVICE r11
    found empirically in DuckDB 1.0)."""
    con = _chain_con(10)
    with pytest.raises(duckdb.Error, match="did not converge"):
        con.execute(f"WITH {_closure_sql(depth=1)} SELECT count(*) FROM comp")


def test_too_shallow_depth_errors_when_cluster_id_read():
    con = _chain_con(10)
    with pytest.raises(duckdb.Error, match="did not converge"):
        con.execute(f"WITH {_closure_sql(depth=1)} SELECT * FROM comp")


def test_converged_depth_passes_count_and_values():
    """Ample depth: every node labels to min(component)=0, and count(*)
    sees all rows (the WHERE conv.n = 0 gate passes everything through)."""
    con = _chain_con(6)
    (n,) = con.execute(
        f"WITH {_closure_sql(depth=8)} SELECT count(*) FROM comp"
    ).fetchone()
    assert n == 6
    rows = con.execute(
        f"WITH {_closure_sql(depth=8)} SELECT doc_id, cluster_id FROM comp ORDER BY doc_id"
    ).fetchall()
    assert rows == [(i, 0) for i in range(6)]


def test_two_components_and_singleton():
    """{0,1,2} + {5,6} + singleton 9: labels are component minima."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES (0),(1),(2),(5),(6),(9)) t(doc_id)"
    )
    con.execute(
        "CREATE TABLE simpairs AS SELECT * FROM (VALUES (0,1),(1,2),(5,6)) t(id1, id2)"
    )
    rows = con.execute(
        f"WITH {_closure_sql(depth=4)} SELECT doc_id, cluster_id FROM comp ORDER BY doc_id"
    ).fetchall()
    assert rows == [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5), (9, 9)]
