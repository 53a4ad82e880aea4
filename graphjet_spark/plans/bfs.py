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


def closeness_centrality(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    *,
    fixed_iters: int = 8,
    round_to: int = 9,
) -> DataFrame:
    """(source, reached, closeness) — Wasserman–Faust closeness of each
    sampled source over its ``fixed_iters``-hop reachable set:
    (reached / sum of dist) · (reached / (n - 1)), the standard
    disconnected-graph correction (n = vertex count of the graph).
    Same sampled-source estimator shape as :func:`harmonic_centrality`
    — one multi-source superstep loop, never all-pairs."""
    n = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    d = bfs_distances_multi(
        spark, edges, sources, fixed_iters=fixed_iters
    ).where(F.col("dist") > 0)
    reached = F.count(F.lit(1)).cast("bigint")
    return d.groupBy("source").agg(
        reached.alias("reached"),
        F.round(
            (reached.cast("double") / F.sum(F.col("dist").cast("double")))
            * (reached.cast("double") / F.lit(float(n - 1))),
            round_to,
        ).alias("closeness"),
    )


def landmark_labels(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: list[int],
    *,
    fixed_iters: int = 6,
) -> DataFrame:
    """Landmark distance-label index (the sampled-landmark form of
    2-hop/pruned landmark labeling, Akiba et al. SIGMOD'13): for every
    vertex, the directed hop distance FROM each landmark (``d_from``)
    and TO each landmark (``d_to``, BFS over reversed edges), bounded
    by the hop budget; -1 marks unreachable-within-budget.  The
    linear-size index behind constant-time distance estimation at web
    scale: est(u, w) = min over landmarks l of d_to(u,l) + d_from(l,w)
    (an upper bound, exact when a shortest path crosses a landmark).

    Both directions run as ONE multi-source superstep loop each
    ((landmark, id)-keyed state, same hygiene as every engine BFS)."""
    fwd = bfs_distances_multi(spark, edges, landmarks, fixed_iters=fixed_iters)
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bwd = bfs_distances_multi(spark, rev, landmarks, fixed_iters=fixed_iters)
    f = fwd.select(
        F.col("source").alias("landmark"), "id", F.col("dist").alias("d_from")
    )
    b = bwd.select(
        F.col("source").alias("landmark"), "id", F.col("dist").alias("d_to")
    )
    return (
        f.join(b, ["landmark", "id"], "full_outer")
        .select(
            "landmark",
            "id",
            F.coalesce("d_from", F.lit(-1)).cast("int").alias("d_from"),
            F.coalesce("d_to", F.lit(-1)).cast("int").alias("d_to"),
        )
    )


def landmark_distance_estimates(
    labels: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Distance-oracle query path over :func:`landmark_labels`: for each
    (u, w) row in ``pairs``, est = min over landmarks of
    d_to(u, l) + d_from(l, w); pairs with no common landmark are
    dropped (unreachable within the index's budget).  Two equi-joins
    against the linear-size label table — no traversal at query time."""
    ul = labels.where(F.col("d_to") >= 0).select(
        F.col("id").alias("u"), "landmark", F.col("d_to").alias("du")
    )
    wl = labels.where(F.col("d_from") >= 0).select(
        F.col("id").alias("w"), "landmark", F.col("d_from").alias("dw")
    )
    return (
        pairs.join(ul, "u")
        .join(wl, ["landmark", "w"])
        .groupBy("u", "w")
        .agg(F.min(F.col("du") + F.col("dw")).cast("int").alias("dist_est"))
    )
