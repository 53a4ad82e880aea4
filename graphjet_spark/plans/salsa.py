"""Batch SALSA on the bipartite src->dst subgraph — deterministic
expected-value formulation.

GraphJet itself ships two SALSA semantics: a Monte-Carlo full-graph
walk and a **deterministic two-phase power iteration over a frozen
per-query subgraph** (reference: graphjet-core/src/main/java/com/
twitter/graphjet/algorithms/salsa/subgraph/SalsaSubgraphInternalState
.java:124-208 and SubgraphSalsa.java:39-103).  This module implements
the latter's semantics with float weights:

  - seeding (salsa/SalsaIterations.java:105-146): seeds with zero
    degree dropped; the query node, if unweighted, takes
    ``total * f/(1-f)`` so it holds fraction ``f`` of all mass
    (default 0.9, SalsaRequestBuilder.java:43); mass scaled to
    ``num_walks`` units;
  - forward (left->right) step (SalsaSubgraphInternalState.java:171-189):
    each subgraph edge (u,v) carries w(u)/deg(u) onto v's CUMULATIVE
    visit weight; afterwards the left side holds only the query node
    with alpha * total left mass (reset, default alpha=0.3);
  - backward (right->left) step (:194-208): w(u) += sum over u's
    subgraph edges of cum_w(v) * 1/deg_sub(v);
  - ``walk_length`` must be odd (SalsaRequestBuilder.java:74-76); the
    final forward step also records social proof (fullgraph/
    FinalSalsaIteration.java:22-36);
  - scores normalized by total RHS visit mass
    (salsa/SalsaSelectResults.java:77-79).

Pinned deviations (deterministic by design, mirrored by the test
oracle): float mass instead of integer walk counts (the reference
ceils/truncates, :146 and :207); the subgraph is the seeds' exact
distinct out-edge set rather than ``num_walks`` sampled edges per seed
(expected-value semantics — GraphJet's own precedent for replacing
per-walk RNG with deterministic spreading).

Scale: the per-query subgraph gather is the only full-table touch — a
broadcast semi-join on the tiny seed set, prunable to CSR blocks by
src; every superstep then runs on the (small) subgraph with
localCheckpoint lineage truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def salsa(
    edges: DataFrame,
    query_node: int,
    seeds_with_weight: dict[int, float] | None = None,
    *,
    num_walks: int = 1000,
    walk_length: int = 5,
    reset_prob: float = 0.3,
    query_weight_fraction: float = 0.9,
    max_results: int | None = 10,
    max_social_proof: int = 2,
    weight_col: str | None = None,
) -> DataFrame:
    """Returns (id, score, social_proof array<struct<w,src>>) ordered by
    score desc, id asc.

    ``weight_col``: optional edge-weight column — transitions become
    proportional to edge weight in both directions (the WeightedNodeVisitor
    generalization, reference algorithms/salsa/SalsaNodeVisitor.java:
    93-115); default is the reference subgraph semantics (uniform over
    distinct edges).
    """
    if walk_length % 2 != 1:
        raise ValueError("walk_length must be odd")  # reference :74-76
    spark = edges.sparkSession

    seeds = dict(seeds_with_weight or {})
    all_left = sorted(set(seeds) | {query_node})
    left_df = broadcast(
        spark.createDataFrame([(v,) for v in all_left], "src bigint")
    )
    if weight_col is None:
        sub = edges.select("src", "dst").join(left_df, "src").distinct()
        sub = sub.withColumn("ew", F.lit(1.0))
    else:
        # multi-edges collapse by summing their weights
        sub = (
            edges.select("src", "dst", F.col(weight_col).alias("w"))
            .join(left_df, "src")
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("ew"))
        )
    sub = sub.localCheckpoint(eager=True)  # freeze the subgraph

    out_deg = sub.groupBy("src").agg(F.sum("ew").alias("deg"))
    in_recip = sub.groupBy("dst").agg((1.0 / F.sum("ew")).alias("recip"))
    links = (
        sub.join(out_deg, "src").join(in_recip, "dst").persist()
    )
    links.count()

    # --- seeding -------------------------------------------------------
    alive = {r["src"] for r in out_deg.select("src").collect()}
    w = {s: wt for s, wt in seeds.items() if s in alive}
    total = float(sum(w.values()))
    if query_node not in w and query_node in alive:
        qw = (
            total * query_weight_fraction / (1.0 - query_weight_fraction)
            if total > 0.0
            else 1.0
        )
        w[query_node] = qw
        total += qw
    if not w:
        return spark.createDataFrame(
            [], "id bigint, score double, social_proof array<struct<w:double,src:bigint>>"
        )
    left_w = spark.createDataFrame(
        [(int(u), wt / total * num_walks) for u, wt in w.items()],
        "id bigint, w double",
    )

    right_cum: DataFrame | None = None
    final_contrib: DataFrame | None = None

    # The whole walk is ONE lazy plan: reset/normalization scalars are
    # single-row aggregate frames cross-joined in, never collected —
    # walk_length is small (default 5) so lineage depth stays bounded
    # without per-step checkpoints, and the entire query runs as a
    # single Spark job.
    for step in range(walk_length):
        forward = step % 2 == 0
        if forward:
            contrib = (
                links.join(broadcast(left_w), links.src == F.col("id"))
                .select(
                    links.dst,
                    (F.col("w") * F.col("ew") / F.col("deg")).alias("c"),
                    links.src.alias("proof_src"),
                )
            )
            step_mass = contrib.groupBy("dst").agg(F.sum("c").alias("c"))
            right_cum = (
                step_mass
                if right_cum is None
                else right_cum.unionByName(step_mass)
                .groupBy("dst")
                .agg(F.sum("c").alias("c"))
            )
            if step == walk_length - 1:  # final forward: social proof
                final_contrib = contrib
            # reset: the left side collapses to the query node holding
            # alpha * total left mass (lazy single-row aggregate)
            left_w = left_w.agg(
                F.sum("w").alias("s")
            ).select(
                F.lit(int(query_node)).alias("id"),
                (F.lit(reset_prob) * F.coalesce(F.col("s"), F.lit(0.0))).alias("w"),
            )
        else:
            gathered = (
                links.join(right_cum, "dst")
                .groupBy("src")
                .agg(F.sum(F.col("c") * F.col("ew") * F.col("recip")).alias("g"))
                .withColumnRenamed("src", "id")
            )
            left_w = (
                left_w.join(gathered, "id", "full")
                .select(
                    "id",
                    (
                        F.coalesce(F.col("w"), F.lit(0.0))
                        + F.coalesce(F.col("g"), F.lit(0.0))
                    ).alias("w"),
                )
            )

    total_mass = right_cum.agg(F.sum("c").alias("tm"))
    proofs = (
        final_contrib.groupBy("dst")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("c").alias("w"), F.col("proof_src").alias("src"))
                    ),
                    asc=False,
                ),
                1,
                max_social_proof,
            ).alias("social_proof")
        )
    )
    result = (
        right_cum.join(proofs, "dst", "left")
        .crossJoin(broadcast(total_mass))
        .select(
            F.col("dst").alias("id"),
            (F.col("c") / F.col("tm")).alias("score"),
            "social_proof",
        )
        .orderBy(F.desc("score"), F.asc("id"))
    )
    if max_results is not None:
        result = result.limit(max_results)
    return result
