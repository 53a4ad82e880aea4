"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values.  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import resource
import sys
import time

import duckdb
import pandas as pd

_soft, _hard = resource.getrlimit(resource.RLIMIT_NOFILE)
resource.setrlimit(resource.RLIMIT_NOFILE, (min(65536, _hard), _hard))

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from graphjet_spark.session import get_spark  # noqa: E402
from graphjet_spark.sources.testdata import TABLES  # noqa: E402


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness_check")
    con = duck_conn(sf_dir)
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in osql:
            print(f"{name}: rows={len(sdf)} (no oracle, rows-only) [{t1 - t0:.1f}s]")
            continue
        odf = con.sql(osql[name]).df()
        t2 = time.time()
        s, o = normalize(sdf), normalize(odf)
        ok = True
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
            ok = False
        elif len(s) != len(o):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(
                    s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
            except AssertionError as e:
                print(f"{name}: VALUE MISMATCH\n{str(e)[:800]}")
                ok = False
        if ok:
            print(f"{name}: OK rows={len(s)} [spark {t1 - t0:.1f}s, duck {t2 - t1:.1f}s]")
        else:
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
