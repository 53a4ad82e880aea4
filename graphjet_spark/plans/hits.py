"""HITS (hubs and authorities) by fixed-point iteration.

Kleinberg's HITS is SALSA's direct ancestor — SALSA is exactly HITS
with the adjacency matrix row/column-normalized (Lempel & Moran 2000),
so a link-graph engine shipping SALSA owes its users HITS too.  One
superstep: authority(v) = sum of hub scores over in-edges, then hub(u)
= sum of authority scores over out-edges, each sum-normalized (the
L1 form — chosen over L2 because it unrolls into exact DuckDB SQL; the
ranking is identical, only the scale differs).

Superstep hygiene as elsewhere: the edge table is partitioned/persisted
once per direction, only the narrow score vectors iterate, lineage is
truncated per step.  ``fixed_iters`` is the oracle-parity mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def hits(
    spark: SparkSession,
    edges: DataFrame,
    *,
    fixed_iters: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Returns (id, hub, authority) after exactly ``fixed_iters``
    sum-normalized iterations over the distinct edge set."""
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
    n = vertices.count()
    h = vertices.select("id", F.lit(1.0 / n).alias("h")).localCheckpoint(
        eager=True
    )

    auth = None
    for _ in range(fixed_iters):
        # authority step: gather hub mass along in-edges, L1-normalize
        a_raw = (
            e.join(h, e.src == h.id)
            .groupBy("dst")
            .agg(F.sum("h").alias("a_raw"))
        )
        a_tot = a_raw.agg(F.coalesce(F.sum("a_raw"), F.lit(0.0)).alias("t"))
        auth = (
            vertices.join(a_raw, vertices.id == a_raw.dst, "left")
            .crossJoin(broadcast(a_tot))
            .select(
                "id",
                (F.coalesce("a_raw", F.lit(0.0)) / F.col("t")).alias("a"),
            )
            .localCheckpoint(eager=False)
        )
        # hub step: gather authority mass along out-edges, L1-normalize
        h_raw = (
            e.join(auth, e.dst == auth.id)
            .groupBy("src")
            .agg(F.sum("a").alias("h_raw"))
        )
        h_tot = h_raw.agg(F.coalesce(F.sum("h_raw"), F.lit(0.0)).alias("t"))
        h = (
            vertices.join(h_raw, vertices.id == h_raw.src, "left")
            .crossJoin(broadcast(h_tot))
            .select(
                "id",
                (F.coalesce("h_raw", F.lit(0.0)) / F.col("t")).alias("h"),
            )
            .localCheckpoint(eager=True)
        )

    out = h.join(auth, "id").select(
        "id", F.col("h").alias("hub"), F.col("a").alias("authority")
    )
    e.unpersist()
    return out
