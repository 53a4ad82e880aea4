"""Single-source BFS hop distances (directed).

The traversal primitive under every "within k hops" product question
(the 2-hop reach gate generalized to arbitrary depth).  Superstep i
relaxes the frontier one hop: dist(v) = min(dist(v), min over in-edges
(u,v) of dist(u)+1).  Only the reached set iterates (frontier-shaped
state, not |V| rows), the edge table is partitioned/persisted once, and
``fixed_iters`` bounds depth exactly — the oracle-parity mode the
unrolled DuckDB SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    *,
    fixed_iters: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Returns (id, dist) for vertices reachable from ``source`` within
    ``fixed_iters`` directed hops (dist = minimum hop count)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    reached = spark.createDataFrame(
        [(int(source), 0)], "id bigint, dist int"
    ).localCheckpoint(eager=True)

    for _ in range(fixed_iters):
        hop = (
            e.join(reached, e.src == reached.id)
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        reached = (
            reached.unionByName(hop)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    return reached


def bfs_distances_multi(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    *,
    fixed_iters: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Multi-source BFS: (source, id, dist) for each source in one
    superstep loop — the state is keyed (source, id), so k sources cost
    one iteration sequence instead of k (the per-seed fan-out trick from
    the second-degree operators applied to traversal depth)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    reached = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources],
        "source bigint, id bigint, dist int",
    ).localCheckpoint(eager=True)

    for _ in range(fixed_iters):
        hop = (
            e.join(reached, e.src == reached.id)
            .select(
                "source",
                F.col("dst").alias("id"),
                (F.col("dist") + 1).alias("dist"),
            )
        )
        reached = (
            reached.unionByName(hop)
            .groupBy("source", "id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    return reached


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    *,
    fixed_iters: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """(source, reached, harmonic) — harmonic centrality of each source
    over its ``fixed_iters``-hop reachable set: sum of 1/dist (Boldi &
    Vigna 2014; the sampled-source estimator is the standard form at
    web scale where all-pairs BFS is impossible)."""
    d = bfs_distances_multi(
        spark, edges, sources, fixed_iters=fixed_iters
    ).where(F.col("dist") > 0)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("reached"),
        F.round(
            F.sum(F.lit(1.0) / F.col("dist").cast("double")), round_to
        ).alias("harmonic"),
    )
