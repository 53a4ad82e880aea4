"""Link-prediction scores over the undirected simple graph: common
neighbors and Adamic–Adar.

The batch form of GraphJet's who-to-follow second-degree machinery
(reference: graphjet-core/src/main/java/com/twitter/graphjet/
algorithms/counting/TopSecondDegreeByCount.java — candidates are
2-hop neighbors scored by shared-neighbor evidence; Adamic–Adar
(2003) is the canonical down-weighting of high-degree shared
neighbors by 1/ln(deg)).

Scale control: wedge centers are capped at ``max_center_degree``.
This is principled, not a shortcut — a center of degree d contributes
1/ln(d) ≈ 0 to every pair it connects while generating d² candidate
pairs, so dropping mega-hub centers removes O(d²) work per hub and
a vanishing score mass (the same skew insight as the reference's
PowerLawDegreeEdgePool tiers).  With the cap, total wedge count is
bounded by cap × 2m — linear in the edge count at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphjet_spark.plans.components import symmetrize


def adamic_adar_pairs(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_center_degree: int = 64,
    min_common: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """(id_a, id_b, common, aa) — vertex pairs sharing >= ``min_common``
    neighbors of degree <= ``max_center_degree``, with the Adamic–Adar
    score summed over those shared neighbors (id_a < id_b)."""
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("a").alias("c")).agg(
        F.count(F.lit(1)).alias("d")
    )
    centers = deg.where(
        (F.col("d") >= 2) & (F.col("d") <= max_center_degree)
    )
    # neighbors of each eligible center, with the center's 1/ln(d)
    nb = (
        sym.join(centers, sym.a == centers.c)
        .select(
            F.col("c"),
            F.col("b").alias("n"),
            (F.lit(1.0) / F.log(F.col("d").cast("double"))).alias("w"),
        )
    )
    u = nb.select("c", F.col("n").alias("id_a"), "w")
    v = nb.select(F.col("c").alias("c2"), F.col("n").alias("id_b"))
    wedges = u.join(
        v, (F.col("c") == F.col("c2")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        wedges.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common"),
            F.round(F.sum("w"), round_to).alias("aa"),
        )
        .where(F.col("common") >= min_common)
    )


def link_prediction_scores(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_center_degree: int = 64,
    min_common: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """The classical link-prediction score family per candidate pair
    (Liben-Nowell & Kleinberg 2003): common neighbors, Jaccard
    coefficient, resource allocation (Zhou et al. 2009 — like
    Adamic–Adar but 1/d instead of 1/ln d), and preferential
    attachment, in one pass over the capped wedge join.

    Candidate generation is the same degree-capped wedge join as
    :func:`adamic_adar_pairs` (bounded at cap × 2m wedges); endpoint
    degrees for Jaccard / preferential attachment are the TRUE
    (uncapped) degrees, joined in after the pair aggregation so the
    decoration is |pairs|-sized work, never wedge-sized.  ``common``
    (and therefore Jaccard's intersection term) counts capped centers
    only — the cap is the semantics here exactly as in
    :func:`adamic_adar_pairs`, since a mega-hub shared neighbor is
    near-zero evidence for a link.

    Returns (id_a, id_b, common, jaccard, resource_alloc, pref_attach)
    with id_a < id_b.
    """
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("a").alias("c")).agg(
        F.count(F.lit(1)).alias("d")
    )
    centers = deg.where(
        (F.col("d") >= 2) & (F.col("d") <= max_center_degree)
    )
    nb = sym.join(centers, sym.a == centers.c).select(
        F.col("c"),
        F.col("b").alias("n"),
        (F.lit(1.0) / F.col("d").cast("double")).alias("ra_w"),
    )
    u = nb.select("c", F.col("n").alias("id_a"), "ra_w")
    v = nb.select(F.col("c").alias("c2"), F.col("n").alias("id_b"))
    pairs = (
        u.join(
            v, (F.col("c") == F.col("c2")) & (F.col("id_a") < F.col("id_b"))
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common"),
            F.sum("ra_w").alias("ra_raw"),
        )
        .where(F.col("common") >= min_common)
    )
    da = deg.select(F.col("c").alias("id_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("c").alias("id_b"), F.col("d").alias("deg_b"))
    return (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")).cast(
                    "double"
                ),
                round_to,
            ).alias("jaccard"),
            F.round(F.col("ra_raw"), round_to).alias("resource_alloc"),
            (F.col("deg_a") * F.col("deg_b"))
            .cast("bigint")
            .alias("pref_attach"),
        )
    )
