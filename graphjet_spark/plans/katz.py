"""Katz centrality by fixed-point iteration.

Katz (1953) counts attenuated walks into each vertex:
x_{k+1}(v) = 1 + alpha * sum over in-edges (u,v) of x_k(u) — the
geometric-series cousin of PageRank without the degree normalization
(GraphJet's influence surface exposes PageRank/SALSA; Katz completes
the classic centrality family over the same superstep machinery).

Convergence requires alpha < 1/lambda_max; callers pick a small
attenuation (default 0.05).  No per-step normalization is needed —
scores are bounded by the geometric series — so each superstep is a
single join + aggregate job, the same one-job shape as the deferred
HITS plan.  ``fixed_iters`` is the oracle-parity mode (unrolled CTE
chain in graphjet_spark.oracles.katz_fixed_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def katz(
    spark: SparkSession,
    edges: DataFrame,
    *,
    alpha: float = 0.05,
    fixed_iters: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Returns (id, katz) after exactly ``fixed_iters`` iterations of
    x = 1 + alpha * A^T x over the distinct edge set."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    x = vertices.select("id", F.lit(1.0).alias("x"))
    for _ in range(fixed_iters):
        gathered = (
            e.join(x, e.src == x.id)
            .groupBy(e.dst.alias("id"))
            .agg(F.sum("x").alias("g"))
        )
        x = (
            vertices.join(gathered, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0)
                    + F.lit(alpha) * F.coalesce("g", F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )

    # L1-normalize once at the end (like the deferred-normalization
    # HITS plan): raw attenuated-walk counts grow geometrically on
    # hub-heavy graphs, and normalizing rescales the float64 sum-order
    # noise with them, keeping the output cross-engine stable at any
    # magnitude.  Ranking is unchanged.
    total = x.agg(F.sum("x")).collect()[0][0]
    e.unpersist()
    if total is None:  # empty graph
        return x.select("id", F.col("x").alias("katz"))
    return x.select(
        "id", (F.col("x") / F.lit(float(total))).alias("katz")
    )


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    *,
    fixed_iters: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """(id, eigen) — power iteration x = A^T x over the undirected
    symmetrized simple graph (Bonacich centrality), L1-normalized once
    at the end (same deferred-normalization argument as HITS/Katz:
    scaling commutes with the linear map and removes per-step global
    jobs; the symmetrized matrix keeps the iteration irreducible on
    each component, unlike the raw directed form which starves source
    vertices)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    sym = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .distinct()
        .repartition(partitions, "a")
        .sortWithinPartitions("a")
        .persist()
    )
    x = sym.select(F.col("a").alias("id")).distinct().select(
        "id", F.lit(1.0).alias("x")
    )
    for _ in range(fixed_iters):
        x = (
            sym.join(x, sym.a == x.id)
            .groupBy(sym.b.alias("id"))
            .agg(F.sum("x").alias("x"))
            .localCheckpoint(eager=True)
        )
    total = x.agg(F.sum("x")).collect()[0][0]
    sym.unpersist()
    if total is None:  # empty graph
        return x.select("id", F.col("x").alias("eigen"))
    return x.select("id", (F.col("x") / F.lit(float(total))).alias("eigen"))
