"""k-core decomposition by iterative peeling.

The k-core of an undirected graph is the maximal subgraph where every
vertex has degree >= k — the standard web/social-graph density filter
(Seidman 1983; the batch cousin of GraphJet's degree-threshold filters
F4/F7, algorithms/MinNumInteractionsFilter.java:49-51, promoted from a
per-query predicate to a closed fixpoint).

Each peel round recomputes degrees over the surviving subgraph and
drops vertices below k; the fixpoint is the k-core.  Superstep hygiene
matches the other plans: the symmetrized edge table is partitioned and
persisted once, only the narrow survivor set iterates, lineage is
truncated per round, and the change count is the (collected) round
metric.  ``fixed_iters`` runs exactly that many rounds — the
oracle-parity mode the unrolled DuckDB SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphjet_spark.plans.components import symmetrize


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Returns (id) — the vertices of the k-core (after ``fixed_iters``
    peel rounds when given, else at the fixpoint)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    sym = (
        symmetrize(edges)
        .repartition(partitions, "a")
        .sortWithinPartitions("a")
        .persist()
    )
    survivors = sym.select(F.col("a").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    n_prev = survivors.count()

    total = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(total):
        # degrees within the surviving subgraph: both endpoints alive
        deg = (
            sym.join(survivors.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(survivors.withColumnRenamed("id", "b"), "b", "left_semi")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        survivors = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("a").alias("id"))
            .localCheckpoint(eager=True)
        )
        n = survivors.count()
        if fixed_iters is None and n == n_prev:
            break
        n_prev = n

    sym.unpersist()
    return survivors


def coreness(
    spark: SparkSession,
    edges: DataFrame,
    *,
    fixed_iters: int = 12,
    partitions: int | None = None,
) -> DataFrame:
    """``(id, coreness)`` — the full core decomposition via iterated
    h-index (Montresor, De Pellegrini & Miorandi, "Distributed k-core
    decomposition", IEEE TPDS 2013; Lü et al. Nature Comm. 2016 proved
    the h-index fixpoint IS coreness): c_0 = degree, c_{t+1}(v) =
    h-index of v's neighbors' c_t.  Monotone non-increasing, so any
    fixed round budget is a valid upper bound and the unrolled DuckDB
    twin matches exactly at the same budget (converged on the gate
    graphs — the peeling-mirror pytest checks true coreness).

    Skew shape: the h-index is computed WITHOUT a per-vertex sort over
    neighbors (a mega-hub would own the window).  Using
    h = max over distinct values c of min(c, #neighbors with value >= c)
    (the max is always attained at a value boundary), the gather is a
    map-side-combined (vertex, value) histogram, a suffix sum over the
    per-vertex DISTINCT-value rows (far fewer than degree), and one MAX
    — every stage two-phase, hub-safe."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    from pyspark.sql import Window

    sym = (
        symmetrize(edges)
        .repartition(partitions, "b")
        .sortWithinPartitions("b")
        .persist()
    )
    cur = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumnRenamed("a", "id")
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("a").orderBy(F.desc("c"))
    for _ in range(fixed_iters):
        hist = (
            sym.join(cur, sym.b == cur.id)
            .groupBy("a", "c")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        cur = (
            hist.withColumn("cum", F.sum("n").over(w))
            .groupBy("a")
            .agg(F.max(F.least(F.col("c"), F.col("cum"))).alias("c"))
            .withColumnRenamed("a", "id")
            .localCheckpoint(eager=True)
        )
    out = cur.select("id", F.col("c").cast("bigint").alias("coreness"))
    sym.unpersist()
    return out
