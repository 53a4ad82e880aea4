"""Driver-contract surface tests — no Spark: fast guards against the
classes of drift that would silently break the correctness gate.

- every oracle key has a queries() twin;
- the rows-only set is exactly the documented five;
- every oracle SQL string PARSES and BINDS in DuckDB against the real
  sf0.001 tables (EXPLAIN only — no execution), so a syntax or
  column-rename regression in oracles.py fails here in seconds instead
  of mid-gate.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E
from graphjet_spark.sources import testdata

SF_DIR = "/root/testdata/sf0.001"

ROWS_ONLY = {
    "salsa_montecarlo",
    "random_multigraph_neighbors",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "scc_labels",
}


def test_oracle_keys_subset_of_queries():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) - set(o) == ROWS_ONLY


def test_every_query_is_callable():
    for name, fn in E.queries().items():
        assert callable(fn), name


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in testdata.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_graph_id_namespaces_disjoint():
    """The unified graph namespaces ids by fixed offsets; if a key
    range outgrows its slot the graph silently merges unrelated nodes
    (this happened at sf1 with 1M spacing: orderkeys reach 1.5M per
    unit sf, so orders bled into the part range from sf0.7 up).  Guard
    every synthesized scale that exists on disk."""
    import glob
    import os

    con = duckdb.connect()
    sf_dirs = sorted(glob.glob("/root/testdata/sf*")) + sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "testdata", "sf*"))
    )
    assert sf_dirs
    for d in sf_dirs:
        row = con.execute(
            f"""SELECT (SELECT max(c_custkey) FROM read_parquet('{d}/customer.parquet')),
                       (SELECT max(o_orderkey) FROM read_parquet('{d}/orders.parquet')),
                       (SELECT max(p_partkey) FROM read_parquet('{d}/part.parquet'))"""
        ).fetchone()
        max_cust, max_order, max_part = row
        assert max_cust < testdata.ORDER_OFS, d
        assert max_order + testdata.ORDER_OFS < testdata.PART_OFS, d
        assert max_part + testdata.PART_OFS < testdata.SUPP_OFS, d


def test_all_oracle_sql_binds_in_duckdb(duck):
    bad = []
    for name, sql in E.oracle_sql().items():
        try:
            duck.execute("EXPLAIN " + sql)
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            bad.append((name, str(ex).splitlines()[0]))
    assert not bad, bad
