"""k-truss decomposition by iterative edge peeling.

The k-truss is the maximal subgraph where every edge participates in at
least k-2 triangles *within the subgraph* (Cohen 2008) — the edge-level
sharpening of the k-core (plans/kcore.py) and the standard dense-
community primitive on web/social graphs.

Each peel round enumerates triangles over the surviving edge set with
the same degree-ordered adjacency-intersection as plans/triangles.py
(out-degree bounded by O(sqrt m), so intersection work stays polynomial
on power-law graphs and no wedge relation is materialized), credits
each triangle to its three edges, and drops edges below the support
threshold.  ``fixed_iters`` rounds make the unrolled
DuckDB oracle exact; the peeling is monotone, so extra rounds after the
fixpoint are no-ops.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    fixed_iters: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Returns the surviving undirected edges (a, b), a < b, after
    ``fixed_iters`` peel rounds at support threshold k-2."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    surv = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .repartition(partitions, "a")
        .localCheckpoint(eager=True)
    )
    thresh = k - 2

    for _ in range(fixed_iters):
        deg = (
            surv.select(F.col("a").alias("id"))
            .union(surv.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
        db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
        j = surv.join(da, "a").join(db, "b")
        lower = F.struct(F.col("da"), F.col("a")) < F.struct(
            F.col("db"), F.col("b")
        )
        o = (
            j.select(
                F.when(lower, F.col("a")).otherwise(F.col("b")).alias("lo"),
                F.when(lower, F.col("b")).otherwise(F.col("a")).alias("hi"),
            )
            .repartition(partitions, "lo")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        o.count()
        # Stage the collect_list adjacency eagerly: fusing the object
        # aggregate with the downstream SMJ + support hashAgg in one
        # task pipeline holds all three operators' buffers live per
        # thread at once (measured 12g-heap OOM at sf1 on 32 threads);
        # materializing between stages keeps each phase's working set
        # alone in the heap and spillable.
        adj = (
            o.groupBy("lo")
            .agg(F.collect_list("hi").alias("ns"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        adj.count()
        a1 = adj.select(F.col("lo").alias("x"), F.col("ns").alias("n1"))
        a2 = adj.select(F.col("lo").alias("y"), F.col("ns").alias("n2"))
        # Triangle triples (x, y, z) materialized ONCE — narrow rows,
        # consumed three times by the per-edge credit union below
        # (unioning straight off the join would recompute the whole
        # adjacency-intersection three times).
        tri = (
            o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
            .join(a1, "x")
            .join(a2, "y")
            .select(
                "x",
                "y",
                F.explode(F.array_intersect("n1", "n2")).alias("z"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        tri.count()
        tri_edges = (
            tri.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
            .unionAll(
                tri.select(
                    F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")
                )
            )
            .unionAll(
                tri.select(
                    F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")
                )
            )
        )
        support = tri_edges.groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("sup")
        )
        surv = (
            surv.join(support, ["a", "b"])
            .where(F.col("sup") >= thresh)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        o.unpersist()
        adj.unpersist()
        tri.unpersist()

    return surv
