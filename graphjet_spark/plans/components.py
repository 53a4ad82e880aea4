"""Hash-min connected components over a DataFrame edge table.

Synchronous min-label flooding: every superstep each vertex takes the
min of its own label and its neighbors' labels; converged when no label
changes.  Exact (north rule).  Shares the superstep shape of
:mod:`graphjet_spark.plans.pagerank`: the symmetrized edge table is
hash-partitioned by gather key once and persisted; only the narrow
``(id, comp)`` state shuffles per superstep; min-aggregation gets
map-side partial combine so mega-hub vertices never concentrate rows.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphjet_spark.plans.checkpoints import CheckpointManager


def symmetrize(edges: DataFrame) -> DataFrame:
    """Distinct undirected adjacency (a, b) with both orientations."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_iter: int = 50,
    fixed_iters: int | None = None,
    checkpoint: CheckpointManager | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Returns ``(id, component)`` — component = min vertex id reachable."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    # gather-key partitioned AND sorted (CSR layout): the cached
    # relation's ordering lets every superstep's sort-merge join skip
    # re-sorting the big edge side
    sym = (
        symmetrize(edges)
        .repartition(partitions, "b")
        .sortWithinPartitions("b")
        .persist()
    )
    vertices = sym.select(F.col("a").alias("id")).distinct()

    start_iter = 0
    labels = None
    if checkpoint is not None:
        last = checkpoint.last_committed()
        if last is not None:
            start_iter = last
            labels = checkpoint.read_state(spark, last)
    if labels is None:
        labels = vertices.select("id", F.col("id").alias("comp"))
        labels = labels.localCheckpoint(eager=True)

    total = fixed_iters if fixed_iters is not None else max_iter
    for it in range(start_iter, total):
        t0 = time.time()
        mins = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("mn"))
        )
        new = (
            labels.withColumnRenamed("comp", "prev")
            .join(mins, labels.id == mins.a, "left")
            .select(
                "id",
                F.least("prev", F.coalesce("mn", F.col("prev"))).alias("comp"),
                "prev",
            )
        )
        # lazy checkpoint: the stats collect is the materializing action
        new = new.localCheckpoint(eager=False)
        stats = (
            new.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(F.col("comp") != F.col("prev"), 1).otherwise(0)).alias(
                    "changed"
                ),
            )
            .collect()
        )
        changed = sum(r["changed"] for r in stats)
        labels = new.select("id", "comp")
        if checkpoint is not None:
            metrics = {
                "algo": "connected_components",
                "rows": sum(r["rows"] for r in stats),
                "changed": changed,
                "elapsed_s": time.time() - t0,
                "partitions": [
                    {"partition_id": r["partition_id"], "rows": r["rows"]} for r in stats
                ],
            }
            committed = checkpoint.commit_state(it + 1, labels, metrics)
            labels = spark.read.parquet(committed)
        if fixed_iters is None and changed == 0:
            break

    sym.unpersist()
    return labels.select("id", F.col("comp").alias("component"))
