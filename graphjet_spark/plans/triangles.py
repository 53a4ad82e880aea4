"""Triangle counting over degree-ordered adjacency.

Each undirected edge is oriented from its lower-(degree, id) endpoint to
the higher one; triangles then appear exactly once as a directed wedge
``lo→m→hi`` closed by ``lo→hi``.  Degree ordering bounds the out-degree
of every vertex by O(√m), which is what keeps the self-join's wedge
count polynomial on power-law graphs (the same skew insight as
GraphJet's degree-tiered pools, reference graphjet-core/src/main/java/
com/twitter/graphjet/bipartite/edgepool/PowerLawDegreeEdgePool.java:37-65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges oriented low (deg, id) → high (deg, id)."""
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    j = und.join(da, "a").join(db, "b")
    lower = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    return j.select(
        F.when(lower, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_count(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Global triangle count; returns a 1-row DataFrame ``(triangles)``."""
    o = oriented_edges(edges).persist()
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    e3 = o.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.hi") == F.col("e2.lo"))
        .join(
            e3,
            (F.col("e1.lo") == F.col("e3.lo")) & (F.col("e2.hi") == F.col("e3.hi")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    result = tri
    return result


def per_vertex_triangles(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation counts ``(id, triangles)``."""
    o = oriented_edges(edges)
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    e3 = o.alias("e3")
    closed = (
        e1.join(e2, F.col("e1.hi") == F.col("e2.lo"))
        .join(
            e3,
            (F.col("e1.lo") == F.col("e3.lo")) & (F.col("e2.hi") == F.col("e3.hi")),
        )
        .select(
            F.col("e1.lo").alias("x"), F.col("e1.hi").alias("y"), F.col("e2.hi").alias("z")
        )
    )
    verts = (
        closed.select(F.col("x").alias("id"))
        .union(closed.select(F.col("y").alias("id")))
        .union(closed.select(F.col("z").alias("id")))
    )
    return verts.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
