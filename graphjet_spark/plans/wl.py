"""Weisfeiler–Leman color refinement (hashed-WL, commutative form).

WL color refinement (Weisfeiler & Leman 1968; Shervashidze et al.
JMLR'11, "Weisfeiler-Lehman graph kernels"): every vertex starts with
its degree as color_0; each round a vertex's new color is a hash of
(its own color, the multiset of its neighbors' colors).  After k
rounds the color partition captures k-hop structural roles — the
canonical structural-fingerprint / role-discovery primitive, and the
expressiveness ceiling of message-passing GNNs.  It generalizes the
one-level degree/co-citation structure GraphJet's intersection
similarity reads (reference graphjet-core/src/main/java/com/twitter/
graphjet/algorithms/intersection/IntersectionSimilarity.java:128-176)
to iterated whole-graph structure.

Multiset hashing here is COMMUTATIVE — per-neighbor color hashes
(md5-prefix BIGINT mod 2^31) are SUMmed and counted, then folded with
the vertex's own color into the next md5.  That turns the per-vertex
gather into one map-side-combinable SUM/COUNT aggregation: no
collect_list, no sorted neighbor strings, no hub-sized rows — the only
WL form that survives a 10%-of-all-edges mega-hub at 100 TB.  (The
sum-hash admits engineered collisions a sorted-multiset hash would
not; for corpus-scale role discovery the ~2^-31 accidental-collision
rate per class is the standard trade — this is the "hash-WL" used by
scalable WL-kernel implementations.)

The hash is the cross-engine md5-prefix-as-BIGINT (the repo's one
engine-neutral hash), so the refinement is a pure function of the
graph and the round budget, and the gate VALUE-compares per-vertex
colors against an unrolled DuckDB twin (oracles.wl_refinement_sql).

Scale shape per round: one equi-join of the (id, color-hash) table
against the symmetrized edges (hash-partitioned + sorted on the join
key once, before the loop), one map-side-combined SUM/COUNT, one
|V|-sized left join.  State is exactly |V| rows of (id, BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphjet_spark.plans.components import symmetrize

# modulus for per-neighbor contributions: keeps SUM over any real
# in-degree (< 2^32 neighbors) inside BIGINT without overflow
_MOD = 2_147_483_647


from graphjet_spark.functions.hashing import md5_prefix_bigint as _h


def wl_colors(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """``(id, wl_color, class_size)`` after ``rounds`` WL refinements
    over the symmetrized simple graph (self-loops dropped, matching
    the other undirected plans).  ``wl_color`` is the hashed color;
    ``class_size`` is its structural-role class population."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    sym = (
        symmetrize(edges)
        .repartition(partitions, "b")
        .sortWithinPartitions("b")
        .persist()
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    lab = (
        vertices.join(deg, vertices.id == deg.a, "left")
        .select(
            "id",
            F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        hc = lab.select(
            F.col("id").alias("nid"),
            (
                _h(F.concat(F.lit("wl:"), F.col("c").cast("string")))
                % F.lit(_MOD)
            ).alias("hc"),
        )
        gath = (
            sym.join(hc, sym.b == hc.nid)
            .groupBy("a")
            .agg(
                F.sum("hc").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
        )
        lab = (
            lab.join(gath, lab.id == gath.a, "left")
            .select(
                "id",
                _h(
                    F.concat(
                        F.lit("wl:"),
                        F.col("c").cast("string"),
                        F.lit(":"),
                        F.coalesce(F.col("s"), F.lit(0)).cast("string"),
                        F.lit(":"),
                        F.coalesce(F.col("n"), F.lit(0)).cast("string"),
                    )
                ).alias("c"),
            )
            .localCheckpoint(eager=True)  # truncate superstep lineage
        )

    classes = lab.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    out = lab.join(classes, "c").select(
        "id", F.col("c").alias("wl_color"), "class_size"
    )
    sym.unpersist()
    return out
