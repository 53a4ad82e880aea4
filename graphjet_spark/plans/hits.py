"""HITS (hubs and authorities) by fixed-point iteration.

Kleinberg's HITS is SALSA's direct ancestor — SALSA is exactly HITS
with the adjacency matrix row/column-normalized (Lempel & Moran 2000),
so a link-graph engine shipping SALSA owes its users HITS too.  One
superstep: authority(v) = sum of hub scores over in-edges, then hub(u)
= sum of authority scores over out-edges.

Normalization is deferred to the very end (one L1 scaling of each
vector): every step is linear, so scaling commutes with iteration and
the final unit-sum vectors are identical to per-step normalization in
exact arithmetic — but deferring removes two global-total broadcast
jobs per superstep, leaving exactly ONE Spark job per iteration (the
eager hub checkpoint).  Raw magnitudes stay far inside float64 range
for any realistic iteration budget (growth per double-step is bounded
by max-degree²).

Superstep hygiene as elsewhere, with one persisted copy of the edge
table per gather direction: the authority step joins on ``src``, the
hub step on ``dst`` — a single-direction copy would reshuffle the full
(100-TB-side) edge table every hub step.  ``fixed_iters`` is the
oracle-parity mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hits(
    spark: SparkSession,
    edges: DataFrame,
    *,
    fixed_iters: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Returns (id, hub, authority) after exactly ``fixed_iters``
    double-steps over the distinct edge set, each vector L1-normalized
    once at the end."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    ded = edges.select("src", "dst").distinct()
    e = (
        ded.repartition(partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    e_dst = (
        ded.repartition(partitions, "dst")
        .sortWithinPartitions("dst")
        .persist()
    )
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    h = vertices.select("id", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(fixed_iters):
        # authority step: gather hub mass along in-edges (absent rows
        # are implicit zeros — they can never re-enter the iteration)
        auth = (
            e.join(h, e.src == h.id)
            .groupBy(e.dst.alias("id"))
            .agg(F.sum("h").alias("a"))
            .localCheckpoint(eager=False)
        )
        # hub step: gather authority mass along out-edges
        h = (
            e_dst.join(auth, e_dst.dst == auth.id)
            .groupBy(e_dst.src.alias("id"))
            .agg(F.sum("a").alias("h"))
            .localCheckpoint(eager=True)
        )

    totals = (
        h.agg(F.sum("h").alias("ht"))
        .crossJoin(auth.agg(F.sum("a").alias("at")))
        .first()
    )
    if totals["ht"] is None or totals["at"] is None:  # empty graph
        e.unpersist()
        e_dst.unpersist()
        return vertices.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    out = (
        vertices.join(h, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            (F.coalesce("h", F.lit(0.0)) / F.lit(totals["ht"])).alias("hub"),
            (F.coalesce("a", F.lit(0.0)) / F.lit(totals["at"])).alias(
                "authority"
            ),
        )
    )
    e.unpersist()
    e_dst.unpersist()
    return out
