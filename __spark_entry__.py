"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank top-k at sf0.001.
``queries()``   — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()``— DuckDB-runnable ANSI SQL equivalents; iterative
                  algorithms use fixed-iteration unrolled CTE chains
                  (graphjet_spark.oracles) with identical arithmetic to
                  the Spark engine's fixed-iteration mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphjet_spark import oracles
from graphjet_spark.operators.degrees import degree_table, top_k_by_degree
from graphjet_spark.plans.components import connected_components
from graphjet_spark.plans.labelprop import label_propagation
from graphjet_spark.plans.pagerank import pagerank
from graphjet_spark.plans.triangles import triangle_count
from graphjet_spark.sources import testdata

PR_ITERS = 10
CC_ITERS = 12
LP_ITERS = 5


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the canonical graph at sf0.001, top 20."""
    edges = testdata.graph_edges(spark, "/root/testdata/sf0.001")
    pr = pagerank(spark, edges, fixed_iters=PR_ITERS)
    return pr.orderBy(F.desc("pagerank"), F.asc("id")).limit(20)


# --- gated queries ----------------------------------------------------


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = testdata.graph_edges(spark, sf_dir).distinct()
    return degree_table(e)


def _q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    inter = testdata.interactions(spark, sf_dir)
    return top_k_by_degree(inter, k=20, side="right")


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = testdata.graph_edges(spark, sf_dir)
    n = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    pr = pagerank(spark, edges, fixed_iters=PR_ITERS)
    return pr.select(
        "id", F.round(F.col("pagerank") * F.lit(float(n)), 4).alias("pagerank_n")
    )


def _q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = testdata.graph_edges(spark, sf_dir)
    return connected_components(spark, edges, fixed_iters=CC_ITERS)


def _q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = testdata.graph_edges(spark, sf_dir)
    return label_propagation(spark, edges, iters=LP_ITERS)


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = testdata.graph_edges(spark, sf_dir)
    return triangle_count(spark, edges)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degrees": _q_degrees,
        "top_parts_by_engagement": _q_top_parts,
        "pagerank_fixed10": _q_pagerank,
        "connected_components": _q_components,
        "label_propagation_5": _q_labelprop,
        "triangle_count": _q_triangles,
    }


def oracle_sql() -> dict[str, str]:
    cte = testdata.oracle_cte()
    return {
        "degrees": cte
        + """
, e AS (SELECT DISTINCT src, dst FROM graph_edges),
od AS (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src),
ind AS (SELECT dst AS id, COUNT(*) AS c FROM e GROUP BY dst)
SELECT COALESCE(od.id, ind.id) AS id,
       COALESCE(od.c, 0) AS out_degree,
       COALESCE(ind.c, 0) AS in_degree
FROM od FULL OUTER JOIN ind ON od.id = ind.id
""",
        "top_parts_by_engagement": cte
        + """
SELECT dst AS id, COUNT(*) AS degree
FROM interactions GROUP BY dst
ORDER BY degree DESC, id DESC LIMIT 20
""",
        "pagerank_fixed10": oracles.pagerank_fixed_sql(PR_ITERS),
        "connected_components": oracles.connected_components_fixed_sql(CC_ITERS),
        "label_propagation_5": oracles.label_propagation_fixed_sql(LP_ITERS),
        "triangle_count": oracles.triangle_count_sql(),
    }
