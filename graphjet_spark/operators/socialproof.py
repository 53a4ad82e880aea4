"""Social-proof lookup: which seed users interacted with which input
nodes, by edge type.

Re-expression of the reference's reverse-index query (graphjet-core/
src/main/java/com/twitter/graphjet/algorithms/socialproof/
TweetSocialProof.java:69-139):

  - per seed user, scan at most MAX_EDGES_PER_NODE latest edges (:88);
  - keep edges whose dst is in the input set AND whose type is in the
    requested types (:94);
  - tweet weight = sum of seed weights over matching edge OCCURRENCES
    (:105-109 — not deduped per user);
  - per (tweet, edge_type): the distinct set of connecting users
    (:113-119);
  - every input node appears in the response, weight 0 if unreached
    (:130-136).

Scale: input set + seeds broadcast; one semi-filtered scan of the edge
table, groupBy(dst) with map-side combine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from graphjet_spark.operators.secondary import MAX_EDGES_PER_NODE


def social_proof(
    edges: DataFrame,
    input_nodes: Sequence[int],
    seeds_with_weight: dict[int, float],
    proof_types: Sequence[int],
    *,
    max_edges_per_node: int = MAX_EDGES_PER_NODE,
) -> DataFrame:
    """Edges: (src, dst, edge_type, seq). Returns one row per input
    node: (id, weight, proofs array<struct<edge_type, users>>)."""
    spark = edges.sparkSession
    seed_df = broadcast(
        spark.createDataFrame(
            [(int(s), float(w)) for s, w in seeds_with_weight.items()],
            "src bigint, seed_weight double",
        )
    )
    input_df = broadcast(
        spark.createDataFrame([(int(t),) for t in input_nodes], "id bigint")
    )
    matched = (
        edges.join(seed_df, "src")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("src").orderBy(F.desc("seq"))),
        )
        .filter(F.col("rn") <= max_edges_per_node)
        .filter(F.col("edge_type").isin([int(t) for t in proof_types]))
        .join(input_df, F.col("dst") == F.col("id"))
        .select("id", "src", "edge_type", "seed_weight")
    )
    by_type = matched.groupBy("id", "edge_type").agg(
        F.sort_array(F.collect_set("src")).alias("users"),
        F.sum("seed_weight").alias("w"),
    )
    agg = by_type.groupBy("id").agg(
        F.sum("w").alias("weight"),
        F.sort_array(
            F.collect_list(F.struct(F.col("edge_type"), F.col("users")))
        ).alias("proofs"),
    )
    return (
        input_df.join(agg, "id", "left")
        .select(
            "id",
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
            F.coalesce("proofs", F.array()).alias("proofs"),
        )
        .orderBy("id")
    )
