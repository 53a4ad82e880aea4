"""Triangle counting over degree-ordered adjacency.

Each undirected edge is oriented from its lower-(degree, id) endpoint to
the higher one; a triangle then appears exactly once, as the common
out-neighbor set of its base edge's endpoints.  Degree ordering bounds
the out-degree of every vertex by O(√m), which keeps both the
per-vertex adjacency arrays and the per-edge intersection work
polynomial on power-law graphs (the same skew insight as GraphJet's
degree-tiered pools, reference graphjet-core/src/main/java/
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


def _closing_neighbors(o: DataFrame) -> DataFrame:
    """(x, y, zs) — for every oriented edge x→y, the array of common
    out-neighbors zs = N⁺(x) ∩ N⁺(y); each triangle {x,y,z} appears
    exactly once, on the edge joining its two lower-ordered vertices.

    Adjacency-intersection form (Latapy TCS'08 edge-iterator family):
    the oriented out-neighbor arrays are bounded ~O(√m) per vertex by
    the degree orientation, so collect_list state is hub-safe, and the
    intersection runs in-core as a native JVM set expression — no
    wedge relation is ever materialized or shuffled, which is what the
    naive wedge self-join + edge SMJ plan pays W >> m rows for."""
    o = o.localCheckpoint(eager=True)  # consumed twice: adjacency + probe
    # Materialize the collect_list aggregate in its own stage: fused
    # with the downstream SMJs + consumer aggregates it holds every
    # operator's buffers live per thread simultaneously (measured
    # 12g-heap OOM at sf1 x 32 threads in the fused form).
    adj = o.groupBy("lo").agg(F.collect_list("hi").alias("ns")).localCheckpoint(
        eager=True
    )
    a1 = adj.select(F.col("lo").alias("x"), F.col("ns").alias("n1"))
    a2 = adj.select(F.col("lo").alias("y"), F.col("ns").alias("n2"))
    return (
        o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
        .join(a1, "x")
        .join(a2, "y")
        .select("x", "y", F.array_intersect("n1", "n2").alias("zs"))
    )


def triangle_count(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Global triangle count; returns a 1-row DataFrame ``(triangles)``."""
    per_edge = _closing_neighbors(oriented_edges(edges))
    return per_edge.agg(
        F.coalesce(F.sum(F.size("zs")), F.lit(0))
        .cast("bigint")
        .alias("triangles")
    )


def directed_triad_census(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One row ``(cyclic_triples, transitive_triples)`` — exact directed
    triangle-motif counts over the simple digraph (distinct (src, dst),
    no self-loops): ``cyclic_triples`` is the number of distinct directed
    3-cycles a→b→c→a (a fully reciprocal triangle contains two), and
    ``transitive_triples`` the number of ordered triples (a, b, c) with
    a→b, b→c and the shortcut a→c — the feed-forward-loop count, the
    hierarchy-vs-feedback signal of directed-motif analysis (Milo et al.,
    Science'02; Holland & Leinhardt's 030T/030C triad classes).

    Scale shape: every motif lives on an undirected triangle, so the
    plan enumerates each triangle ONCE via the same degree-ordered
    adjacency intersection as :func:`triangle_count` (O(m^1.5)-bounded
    on power-law graphs) and then classifies it by the six direction
    bits equi-joined from a canonical pair-flag relation — it never
    pays the Σ in(b)·out(b) wedge fan-out of naive directed path joins
    (which is exactly the independent plan the DuckDB oracle runs, so
    the two derivations cross-check each other)."""
    dirs = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    flags = (
        dirs.select(
            F.least("src", "dst").alias("p"),
            F.greatest("src", "dst").alias("q"),
            (F.col("src") < F.col("dst")).alias("isfwd"),
        )
        .groupBy("p", "q")
        .agg(
            F.max(F.col("isfwd")).alias("fwd"),
            F.max(~F.col("isfwd")).alias("rev"),
        )
    )
    tri = (
        _closing_neighbors(oriented_edges(edges))
        .select("x", "y", F.explode("zs").alias("z"))
        .select(F.array_sort(F.array("x", "y", "z")).alias("v"))
        .select(
            F.col("v")[0].alias("u"),
            F.col("v")[1].alias("v_"),
            F.col("v")[2].alias("w"),
        )
    )
    f = [
        flags.select(
            F.col("p").alias(pc),
            F.col("q").alias(qc),
            F.col("fwd").alias(f"f{i}"),
            F.col("rev").alias(f"r{i}"),
        )
        for i, (pc, qc) in enumerate(
            [("u", "v_"), ("v_", "w"), ("u", "w")], start=1
        )
    ]
    j = tri.join(f[0], ["u", "v_"]).join(f[1], ["v_", "w"]).join(f[2], ["u", "w"])
    b = lambda c: F.col(c).cast("int")  # noqa: E731
    f1, r1, f2, r2, f3, r3 = (b(c) for c in ("f1", "r1", "f2", "r2", "f3", "r3"))
    cyc = f1 * f2 * r3 + r1 * r2 * f3
    trans = (
        f1 * f2 * f3
        + f3 * r2 * f1
        + r1 * f3 * f2
        + f2 * r3 * r1
        + r3 * f1 * r2
        + r2 * r1 * r3
    )
    return j.agg(
        F.coalesce(F.sum(cyc), F.lit(0)).cast("bigint").alias("cyclic_triples"),
        F.coalesce(F.sum(trans), F.lit(0))
        .cast("bigint")
        .alias("transitive_triples"),
    )


def per_vertex_triangles(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation counts ``(id, triangles)``."""
    closed = _closing_neighbors(oriented_edges(edges)).select(
        "x", "y", F.explode("zs").alias("z")
    )
    verts = (
        closed.select(F.col("x").alias("id"))
        .union(closed.select(F.col("y").alias("id")))
        .union(closed.select(F.col("z").alias("id")))
    )
    return verts.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
