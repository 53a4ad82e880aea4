"""Seed-weighted second-degree counting (TopSecondDegreeByCount).

Re-expression of the reference's deterministic 2-hop recommender
(graphjet-core/src/main/java/com/twitter/graphjet/algorithms/counting/
TopSecondDegreeByCount.java:84-142):

  - per seed, consider only the latest ``max_edges_per_node`` edges
    (MAX_EDGES_PER_NODE = 500 at :47), in insertion order;
  - dedup per (seed, right, edge_type) (:99-103);
  - candidate weight += seed weight per surviving edge; social proof
    accumulates (edge_type, seed, weight) per candidate
    (NodeInfo.addToWeight/addToSocialProof, algorithms/NodeInfo.java:
    96-106);
  - top-k by weight (counting/TopSecondDegreeByCountTweetRecsGenerator
    .java:67-79).

Pinned deviation: the reference's per-seed dedup keeps a single-slot
map rightNode -> last edgeType (:99-103), so (r,0),(r,1),(r,0) counts
the third occurrence; we dedup on the full (seed, right, type) set —
the documented intent ("skip repeated edges").

Scale: seeds are a tiny broadcast side; the latest-K cap is a
row_number window partitioned by the seed (bounded: each seed's edges
fit one task by the cap itself); aggregation is a plain groupBy(dst)
with map-side combine; social-proof arrays are trimmed inside the agg
via slice(sort_array(...)) so no unbounded array leaves an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

MAX_EDGES_PER_NODE = 500  # reference :47


def top_second_degree_by_count(
    edges: DataFrame,
    seeds_with_weight: dict[int, float],
    *,
    max_results: int | None = 10,
    max_edges_per_node: int = MAX_EDGES_PER_NODE,
    max_social_proof: int = 2,
    tweet_proof_type: int | None = None,
    min_user_social_proof_size: int | None = None,
) -> DataFrame:
    """Edges: (src, dst, edge_type, seq) where ``seq`` is the insertion
    order key (GraphJet's chronological segment order). Returns
    (id, weight, visits, social_proof array<struct<w,src,edge_type>>,
    proof_types) ordered weight desc, id asc.

    Tweet-rec business rules (reference counting/
    TopSecondDegreeByCountTweetRecsGenerator.java:118-165, applied
    before the top-k queue):

    - ``tweet_proof_type``: drop candidates whose social proof exists
      ONLY for this type (isTweetSocialProofOnly — a tweet engaging a
      tweet is not user evidence);
    - ``min_user_social_proof_size``: drop candidates where no single
      proof type has at least this many distinct proof users
      (isLessThantMinUserSocialProofSize).

    Both default to None = generic recs (no rule).  Id un-masking
    (TweetIDMask.restore) is the C1 codec's concern
    (functions/idcodec.py) and is not applied here."""
    spark = edges.sparkSession
    seed_df = broadcast(
        spark.createDataFrame(
            [(int(s), float(w)) for s, w in seeds_with_weight.items()],
            "src bigint, seed_weight double",
        )
    )
    latest = (
        edges.join(seed_df, "src")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("src").orderBy(F.desc("seq"))),
        )
        .filter(F.col("rn") <= max_edges_per_node)
        .select("src", "dst", "edge_type", "seed_weight")
        .distinct()  # (seed, right, type) dedup — F11
    )
    if tweet_proof_type is not None or min_user_social_proof_size is not None:
        # per (candidate, type) distinct-proof-user counts — `latest` is
        # distinct on (src, dst, edge_type) so count(*) counts users
        per_type = latest.groupBy("dst", "edge_type").agg(
            F.count(F.lit(1)).alias("n_users")
        )
        conds = []
        if tweet_proof_type is not None:
            conds.append(F.col("has_non_tweet") == 1)
        if min_user_social_proof_size is not None:
            conds.append(F.col("max_type_users") >= min_user_social_proof_size)
        keep = per_type.groupBy("dst").agg(
            F.max(
                F.when(
                    F.col("edge_type") != (tweet_proof_type if tweet_proof_type is not None else -1),
                    1,
                ).otherwise(0)
            ).alias("has_non_tweet"),
            F.max("n_users").alias("max_type_users"),
        )
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        latest = latest.join(keep.filter(cond).select("dst"), "dst", "left_semi")
    out = (
        latest.groupBy("dst")
        .agg(
            F.sum("seed_weight").alias("weight"),
            F.count(F.lit(1)).alias("visits"),
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("seed_weight").alias("w"),
                            F.col("src").alias("src"),
                            F.col("edge_type").alias("edge_type"),
                        )
                    ),
                    asc=False,
                ),
                1,
                max_social_proof,
            ).alias("social_proof"),
            F.array_distinct(F.collect_list("edge_type")).alias("proof_types"),
        )
        .select(
            F.col("dst").alias("id"),
            "weight",
            "visits",
            "social_proof",
            "proof_types",
        )
        .orderBy(F.desc("weight"), F.asc("id"))
    )
    # only apply a real limit (limit(huge N) allocates an N-heap/partition)
    return out.limit(max_results) if max_results is not None else out
