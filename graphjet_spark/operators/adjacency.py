"""CSR-like adjacency blocks with mega-hub vertex splitting.

The batch analogue of GraphJet's optimized read-only segment index
(reference: graphjet-core/src/main/java/com/twitter/graphjet/bipartite/
edgepool/OptimizedEdgePool.java:35-47 — per-node position+degree into one
contiguous edge array; built by bipartite/optimizer/Optimizer.java:88-130
when a segment seals) and of its power-law-aware tiered layout
(bipartite/edgepool/PowerLawDegreeEdgePool.java:37-65).

Layout produced here (the north rule's "salted, hash-partitioned
CSR-like (src-sorted, offset-indexed) partition blocks"):

    adjacency(src bigint, sub int, degree bigint, neighbors array<bigint>)

- hash-partitioned by ``src`` into ``partitions`` buckets and sorted by
  (src, sub) within each partition -> a node's rows are contiguous and
  parquet row-group min/max stats on ``src`` are the offset index
  (Catalyst prunes blocks for point lookups).
- **vertex splitting**: a src with degree > ``split_threshold`` becomes
  ``ceil(degree/threshold)`` rows, sub = pmod(xxhash64(dst), nsplits).
  The split key is derived from ``dst`` — NOT a window row_number — so
  building the blocks never funnels a mega-hub's edge list through a
  single task. Readers re-merge by summing/unioning over ``sub``
  (two-phase aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SPLIT_THRESHOLD = 100_000


def adjacency_blocks(
    edges: DataFrame,
    *,
    partitions: int = 32,
    split_threshold: int = DEFAULT_SPLIT_THRESHOLD,
) -> DataFrame:
    """Build the salted CSR-like adjacency table from (src, dst) edges."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    nsplit = F.greatest(
        F.lit(1), F.ceil(F.col("degree") / F.lit(split_threshold))
    ).cast("int")
    salted = (
        edges.join(deg, "src")
        .withColumn("sub", F.pmod(F.xxhash64("dst"), nsplit).cast("int"))
    )
    return (
        salted.groupBy("src", "sub")
        .agg(
            F.count(F.lit(1)).alias("degree"),
            F.sort_array(F.collect_list("dst")).alias("neighbors"),
        )
        .repartition(partitions, "src")
        .sortWithinPartitions("src", "sub")
    )


def merged_degrees(adjacency: DataFrame) -> DataFrame:
    """Re-merge split vertices: true out-degree per src (two-phase agg —
    partial sums already happened per sub-vertex at build time)."""
    return adjacency.groupBy("src").agg(F.sum("degree").alias("out_degree"))


def block_summary(adjacency: DataFrame) -> DataFrame:
    """Per physical partition: (partition_id, rows, min_src, max_src) —
    the offset-index / lineage row the north rule asks each block to
    carry (mirrors OptimizedEdgePool's per-pool position metadata)."""
    return (
        adjacency.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("src").alias("min_src"),
            F.max("src").alias("max_src"),
            F.sum("degree").alias("edges"),
        )
    )


def numbered_edge(adjacency: DataFrame, node: int, i: int) -> DataFrame:
    """The i-th (1-based) neighbor of a node in block order — the
    getNumberedEdge lookup (reference: graphjet-core/src/main/java/com/
    twitter/graphjet/bipartite/edgepool/PowerLawDegreeEdgePool.java:
    414-420).  Spans split sub-vertices via a running offset."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy("sub")
    rows = (
        adjacency.filter(F.col("src") == node)
        .withColumn("offset", F.coalesce(
            F.sum("degree").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ))
    )
    return rows.filter(
        (F.lit(i) > F.col("offset")) & (F.lit(i) <= F.col("offset") + F.col("degree"))
    ).select(
        F.element_at("neighbors", (F.lit(i) - F.col("offset")).cast("int")).alias("dst")
    )


def skip_neighbors(adjacency: DataFrame, node: int, n: int) -> DataFrame:
    """All neighbors after skipping the first n (iterator ``skip(n)``
    pagination — reference bipartite/api/EdgeIterator.java:47)."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy("sub")
    rows = (
        adjacency.filter(F.col("src") == node)
        .withColumn("offset", F.coalesce(
            F.sum("degree").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ))
    )
    return rows.select(
        F.explode(
            F.when(
                F.col("offset") >= n, F.col("neighbors")
            ).otherwise(
                F.slice(
                    "neighbors",
                    (F.lit(n) - F.col("offset") + 1).cast("int"),
                    F.greatest(
                        (F.col("degree") - (F.lit(n) - F.col("offset"))).cast("int"),
                        F.lit(0),
                    ),
                )
            )
        ).alias("dst")
    )


def neighbors_of(adjacency: DataFrame, node: int) -> DataFrame:
    """Point adjacency lookup (reference: LeftIndexedBipartiteGraph.java:58
    getLeftNodeEdges). The src filter prunes row groups via parquet
    min/max stats because blocks are src-sorted."""
    return (
        adjacency.filter(F.col("src") == node)
        .select(F.explode("neighbors").alias("dst"))
    )
