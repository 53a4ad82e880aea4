"""Intersection (co-occurrence) similarity with pluggable normalization.

Deterministic full-scan re-expression of GraphJet's
IntersectionSimilarity (reference: graphjet-core/src/main/java/com/
twitter/graphjet/algorithms/intersection/IntersectionSimilarity.java:
77-185):

  1. gather the left neighbors of the query node + seed right nodes,
     deduped per seed; a left node's weight = #seeds it touches
     (:86-117);
  2. expand each left neighbor to its right neighbors, deduped per
     left node (F11), accumulating weighted (x f(left_degree)) and raw
     co-occurrence counts (:118-154);
  3. drop candidates with raw co-occurrence < min_cooccurrence, score =
     weighted x g(weighted, candidate_degree, query_degree), top-k
     (:156-184).

Deviation from the reference (documented, deterministic by design): the
reference samples ``maxNumNeighbors`` / ``maxNumSamplesPerNeighbor``
edges when degrees exceed the caps; we evaluate the exact full
neighborhood — the expected-value semantics (degree caps are still
honored via ``min_neighbor_degree``).

Scale: the seed set is tiny -> the first gather is a broadcast
semi-join; the 2-hop expansion is the classic co-occurrence self-join
(J2) keyed on the left node, with map-side partial aggregation on the
candidate key; degree decoration joins a precomputable degrees table.

Normalization strategies (reference formulas, file:line in NORMS):
f = contribution(left_degree), g = norm(cooccurrence, cand_deg, query_deg).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


@dataclass(frozen=True)
class Normalization:
    """R10 strategy pair (reference: intersection/
    RelatedTweetUpdateNormalization.java:23-43)."""

    contribution: Callable[[Column], Column]  # f(left_degree)
    score_norm: Callable[[Column, Column, Column], Column]  # g(cooc, sdeg, qdeg)


NORMS: dict[str, Normalization] = {
    # intersection/CosineUpdateNormalization.java:34,47-50
    "cosine": Normalization(
        lambda d: F.lit(1.0),
        lambda c, sd, qd: 1.0 / F.sqrt(sd),
    ),
    # intersection/JaccardUpdateNormalization.java:34,47
    "jaccard": Normalization(
        lambda d: F.lit(1.0),
        lambda c, sd, qd: 1.0 / (sd + qd - c),
    ),
    # intersection/OverlapUpdateNormalization.java:34,48
    "overlap": Normalization(
        lambda d: F.lit(1.0),
        lambda c, sd, qd: F.lit(1.0),
    ),
    # intersection/InverseDegreeUpdateNormalization.java:34,47
    "inverse_degree": Normalization(
        lambda d: 1.0 / d,
        lambda c, sd, qd: F.lit(1.0),
    ),
    # intersection/ScaledUpdateNormalization.java:36,50
    "scaled": Normalization(
        lambda d: F.lit(0.6931471805599453) / F.log(d),
        lambda c, sd, qd: 1.0
        / (F.sqrt(sd) * F.sqrt(F.abs(sd - qd) + F.lit(1.0))),
    ),
}


def _zero_if_inf(col: Column) -> Column:
    """The reference zeroes infinite contributions/norms
    (IntersectionSimilarity.java:147,169)."""
    return F.when(F.abs(col) == float("inf"), F.lit(0.0)).otherwise(col)


# Deterministic Lehmer-style index sampler for the capped-gather mode:
# sample j in [0, cap) maps to edge index ((A*(node%M * cap + j + seed))
# % M) % degree — plain modular arithmetic, identical in the JVM
# expression and the literal Python mirror in tests (no engine-private
# RNG), with replacement like GraphJet's getRandomRightNodeEdges.
_SAMPLE_M = (1 << 31) - 1
_SAMPLE_A = 16807


def _sampled_neighbor_sets(
    edges: DataFrame,
    node_col: str,
    nbr_col: str,
    *,
    cap: int,
    seed: int,
    full_when: str,
    order_col: str | None = None,
) -> DataFrame:
    """Per-node deduped neighbor sets under a sampling cap — the Spark
    form of the reference's capped gathers (IntersectionSimilarity.java
    :92-99 right-side gather with ``degree <= cap`` full / else sample;
    :128-133 left-side expand with ``degree < cap``).

    Nodes within the cap keep their full (distinct) neighbor set; nodes
    over it draw ``cap`` samples with replacement by deterministic
    index, realized as an equi-join of sampled indices against
    row-numbered edges — never a per-node collect.  ``full_when`` is
    '<=' (gather) or '<' (expand).  Output (node, nbr) distinct.
    """
    e = edges.select(
        F.col(node_col).alias("node"), F.col(nbr_col).alias("nbr"),
        *( [F.col(order_col).alias("ord")] if order_col else [] ),
    )
    if order_col is None:
        e = e.withColumn("ord", F.col("nbr"))
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("ord")
    numbered = e.withColumn("rn", F.row_number().over(w) - 1)
    deg = numbered.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    cmp_full = (
        F.col("deg") <= cap if full_when == "<=" else F.col("deg") < cap
    )
    full_nodes = deg.filter(cmp_full).select("node")
    over_nodes = deg.filter(~cmp_full).select("node", "deg")

    full_part = (
        numbered.join(full_nodes, "node", "left_semi")
        .select("node", "nbr")
        .distinct()
    )
    x = (F.pmod(F.col("node"), F.lit(_SAMPLE_M))) * cap + F.col("j") + F.lit(seed)
    idx = F.pmod(F.pmod(x * _SAMPLE_A, F.lit(_SAMPLE_M)), F.col("deg"))
    sampled_idx = (
        over_nodes.select(
            "node",
            "deg",
            F.explode(F.sequence(F.lit(0), F.lit(cap - 1))).alias("j"),
        )
        .select("node", idx.alias("rn"))
        .distinct()  # with-replacement duplicates collapse (per-node dedup)
    )
    sampled_part = sampled_idx.join(numbered, ["node", "rn"]).select("node", "nbr")
    # distinct = the reference's per-node neighborSet dedup (duplicate
    # sampled indices and multigraph repeats both collapse)
    return full_part.unionByName(sampled_part).distinct()


def intersection_similarity(
    edges: DataFrame,
    query_node: int,
    seed_set: list[int] | None = None,
    *,
    normalization: str | Normalization = "cosine",
    max_results: int | None = 10,
    min_cooccurrence: int = 2,
    min_neighbor_degree: int = 1,
    max_num_neighbors: int | None = None,
    max_num_samples_per_neighbor: int | None = None,
    sample_seed: int = 42,
    tables=None,
) -> DataFrame:
    """Similar right nodes to ``query_node`` over a (src, dst) edge table.

    Returns (id, score, cooccurrence, degree) ordered by score desc,
    id asc (deterministic tie-break; the reference's heap leaves ties
    unspecified).

    ``max_num_neighbors`` / ``max_num_samples_per_neighbor`` enable the
    reference's capped-gather mode (IntersectionSimilarity.java:92-99,
    128-133): seeds over the first cap contribute a sampled neighbor
    subset (``degree <= cap`` keeps the full set); left neighbors at or
    over the second cap expand through a sampled subset (``degree <
    cap`` keeps the full set — the reference's asymmetric comparisons
    are preserved).  Contributions and all degree checks still use the
    *true* degrees, exactly like the reference.  Caps are THE bounded-
    work control on hub queries: without them one celebrity seed makes
    the 2-hop join fan out by its full degree.  Default None = exact
    full-neighborhood mode (deterministic, used by the oracle gates).

    ``tables``: optional :class:`graphjet_spark.plans.context.GraphTables`
    — the engine-resident pair/degree tables; passing it skips the
    per-query distinct + degree materialization (one per engine
    instance, like the reference's resident index).
    """
    norm = NORMS[normalization] if isinstance(normalization, str) else normalization
    spark = edges.sparkSession
    targets = sorted(set(seed_set or []) | {query_node})
    target_df = broadcast(
        spark.createDataFrame([(t,) for t in targets], "seed bigint")
    )

    if tables is not None:
        e, out_deg, in_deg = tables.pairs, tables.out_deg, tables.in_deg
    else:
        # the simple pair set is referenced 4x in the plan — materialize
        # once (per query; pass ``tables`` to amortize across queries)
        e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
        out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("left_degree"))
        in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("right_degree"))

    # 1. left neighbors of query+seeds, deduped per seed; weight = #seeds
    seed_edges = e.join(target_df, e.dst == F.col("seed")).select("dst", "src")
    if max_num_neighbors is not None:
        seed_nbrs = _sampled_neighbor_sets(
            seed_edges,
            "dst",
            "src",
            cap=max_num_neighbors,
            seed=sample_seed,
            full_when="<=",
        ).select(F.col("node").alias("dst"), F.col("nbr").alias("src"))
    else:
        seed_nbrs = seed_edges.distinct()
    left_neighbors = seed_nbrs.groupBy("src").agg(
        F.count(F.lit(1)).alias("weight")
    )

    # 2. two-hop co-occurrence with per-left-neighbor dedup (F11)
    if max_num_samples_per_neighbor is not None:
        expand_edges = e.join(left_neighbors, "src", "left_semi")
        expanded = _sampled_neighbor_sets(
            expand_edges,
            "src",
            "dst",
            cap=max_num_samples_per_neighbor,
            seed=sample_seed,
            full_when="<",
        ).select(F.col("node").alias("src"), F.col("nbr").alias("dst"))
    else:
        expanded = e
    hops = (
        expanded.join(left_neighbors, "src")
        .join(out_deg, "src")
        .filter(F.col("left_degree") >= min_neighbor_degree)
        .select("src", "dst", "weight", "left_degree")
        # (left, right) dedup (the reference's per-u seen set) is already
        # guaranteed: inputs are distinct and both joins are N:1
    )
    cooc = hops.groupBy("dst").agg(
        F.sum(
            F.col("weight") * _zero_if_inf(norm.contribution(F.col("left_degree")))
        ).alias("weighted_cooc"),
        F.sum("weight").alias("cooccurrence"),
    )

    # 3. normalize + select
    qdeg_row = in_deg.filter(F.col("dst") == query_node).first()
    query_degree = qdeg_row["right_degree"] if qdeg_row else 0
    if query_degree == 0:
        # reference returns null on zero-degree query (:83-86)
        return spark.createDataFrame(
            [], "id bigint, score double, cooccurrence bigint, degree bigint"
        )
    scored = (
        cooc.filter(F.col("cooccurrence") >= min_cooccurrence)
        .join(in_deg, "dst")
        .select(
            F.col("dst").alias("id"),
            (
                F.col("weighted_cooc")
                * _zero_if_inf(
                    norm.score_norm(
                        F.col("weighted_cooc"),
                        F.col("right_degree"),
                        F.lit(float(query_degree)),
                    )
                )
            ).alias("score"),
            F.col("cooccurrence"),
            F.col("right_degree").alias("degree"),
        )
    )
    out = scored.orderBy(F.desc("score"), F.asc("id"))
    # NOTE: only apply a real limit — limit(huge N) makes Spark's
    # TakeOrderedAndProject allocate an N-capacity heap per partition.
    return out.limit(max_results) if max_results is not None else out
