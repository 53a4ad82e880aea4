"""ANSI-SQL oracle generators for the driver's DuckDB correctness gate.

Iterative algorithms (PageRank, hash-min connected components, label
propagation) are not expressible as single SQL statements at unbounded
depth, but their *fixed-iteration* forms unroll mechanically into a
chain of CTEs — one per superstep — that DuckDB executes exactly.  The
Spark engine runs the same fixed number of supersteps with the same
arithmetic for the gated queries, so values match (floats compared
after identical ROUNDing on both sides).

All generators assume the canonical views/CTEs from
:mod:`graphjet_spark.sources.testdata` (``interactions``,
``graph_edges``) are in scope via :func:`testdata.oracle_cte`.
"""

from __future__ import annotations

from graphjet_spark.sources.testdata import oracle_cte

# Shared simple-graph prelude over graph_edges.
GRAPH_PRELUDE = """
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM graph_edges),
v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src),
sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM e WHERE src <> dst
        UNION SELECT dst, src FROM e WHERE src <> dst)
"""


def pagerank_fixed_sql(iters: int, damping: float = 0.85, round_to: int = 4) -> str:
    """Unrolled power-iteration PageRank; output (id, pagerank_n) where
    pagerank_n = rank * N rounded — normalized so rounding granularity is
    scale-free."""
    d = damping
    parts = [
        "r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM v)",
    ]
    for i in range(iters):
        p, c = f"r{i}", f"r{i + 1}"
        parts.append(
            f"""d{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {p}
  LEFT JOIN od ON {p}.id = od.src WHERE od.src IS NULL)"""
        )
        parts.append(
            f"""{c} AS MATERIALIZED (
  SELECT v.id,
         (1.0 - {d})/(SELECT n FROM nn) + {d}*(SELECT dm FROM d{i})/(SELECT n FROM nn)
         + {d} * COALESCE(c.contrib, 0.0) AS rank
  FROM v LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / od.deg) AS contrib
    FROM {p} r JOIN e ON r.id = e.src JOIN od ON e.src = od.src
    GROUP BY e.dst
  ) c ON v.id = c.id)"""
        )
    body = ",\n".join(parts)
    return (
        oracle_cte().rstrip()
        + ",\n"
        + GRAPH_PRELUDE.strip()
        + ",\n"
        + body
        + f"\nSELECT id, ROUND(rank * (SELECT n FROM nn), {round_to}) AS pagerank_n"
        + f" FROM r{iters}"
    )


def connected_components_fixed_sql(iters: int) -> str:
    """Unrolled hash-min label flooding; output (id, component)."""
    parts = ["c0 AS MATERIALIZED (SELECT id, id AS comp FROM v)"]
    for i in range(iters):
        p, c = f"c{i}", f"c{i + 1}"
        parts.append(
            f"""{c} AS MATERIALIZED (
  SELECT cur.id, LEAST(cur.comp, COALESCE(m.mn, cur.comp)) AS comp
  FROM {p} cur LEFT JOIN (
    SELECT s.a AS id, MIN(n.comp) AS mn
    FROM sym s JOIN {p} n ON s.b = n.id
    GROUP BY s.a
  ) m ON cur.id = m.id)"""
        )
    body = ",\n".join(parts)
    return (
        oracle_cte().rstrip()
        + ",\n"
        + GRAPH_PRELUDE.strip()
        + ",\n"
        + body
        + f"\nSELECT id, comp AS component FROM c{iters}"
    )


def label_propagation_fixed_sql(iters: int) -> str:
    """Unrolled synchronous label propagation, deterministic tie-break
    (highest neighbor-label count, then smallest label); isolated-free
    graph (every vertex in ``v`` has a ``sym`` neighbor).  Output
    (id, label)."""
    parts = ["l0 AS MATERIALIZED (SELECT id, id AS lbl FROM v)"]
    for i in range(iters):
        p, c = f"l{i}", f"l{i + 1}"
        parts.append(
            f"""{c} AS MATERIALIZED (
  SELECT id, lbl FROM (
    SELECT s.a AS id, n.lbl,
           ROW_NUMBER() OVER (
             PARTITION BY s.a
             ORDER BY COUNT(*) DESC, n.lbl ASC) AS rn
    FROM sym s JOIN {p} n ON s.b = n.id
    GROUP BY s.a, n.lbl
  ) t WHERE rn = 1)"""
        )
    body = ",\n".join(parts)
    return (
        oracle_cte().rstrip()
        + ",\n"
        + GRAPH_PRELUDE.strip()
        + ",\n"
        + body
        + f"\nSELECT id, lbl AS label FROM l{iters}"
    )


def triangle_count_sql() -> str:
    """Degree-ordered triangle count (global). Orientation: each
    undirected edge points from lower (deg, id) to higher, so every
    triangle is counted exactly once."""
    return (
        oracle_cte().rstrip()
        + ",\n"
        + """
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM graph_edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT id, COUNT(*) AS d FROM (
          SELECT a AS id FROM und UNION ALL SELECT b FROM und
        ) GROUP BY id),
orient AS MATERIALIZED (
  SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS lo,
         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS hi
  FROM und u JOIN deg da ON u.a = da.id JOIN deg db ON u.b = db.id
)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM orient e1
JOIN orient e2 ON e1.hi = e2.lo
JOIN orient e3 ON e1.lo = e3.lo AND e2.hi = e3.hi
""".strip()
    )
