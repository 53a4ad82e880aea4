"""Seeded sampling primitives: alias tables, uniform neighbor sampling,
and the RandomMultiGraphNeighbors query.

Reference semantics:
- alias table: O(n) construction, O(1) per draw (graphjet-core/src/
  main/java/com/twitter/graphjet/math/AliasTableUtil.java:46-143) —
  here a vectorized numpy construction (Vose's method);
- uniform neighbor sampling with replacement (bipartite/api/
  LeftIndexedBipartiteGraph.java:70 getRandomLeftNodeEdges);
- RandomMultiGraphNeighbors (algorithms/randommultigraphneighbors/
  RandomMultiGraphNeighbors.java:87-148): draw ``max_num_samples`` seed
  nodes with P(u) ∝ weight(u) * degree(u) via the alias table, sample
  one uniform neighbor per draw, score per neighbor = occurrences /
  max_num_samples, top-k by score.

Determinism: all RNG is numpy, seeded from an explicit ``seed``; the
distributed neighbor-sampling stage seeds per seed-node
(``seed ^ src``), so results do not depend on partitioning or task
order (SURVEY.md §7 mitigation 3).

Scale: seed draws happen driver-side (the seed set is a point-query
payload, same as the reference); neighbor sampling fans out as an
``applyInPandas`` over the seeds' adjacency groups — each group is one
node's neighbor list (bounded by the per-node cap), numpy-vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def build_alias_table(weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vose alias table over unnormalized weights: returns (prob, alias).

    Same structure as the reference's int-array alias table
    (math/IntArrayAliasTable.java:38-66) with float probabilities.
    """
    n = len(weights)
    p = np.asarray(weights, dtype=np.float64)
    p = p / p.sum() * n
    alias = np.zeros(n, dtype=np.int64)
    prob = np.ones(n, dtype=np.float64)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    return prob, alias


def sample_alias(
    prob: np.ndarray, alias: np.ndarray, n_draws: int, rng: np.random.Generator
) -> np.ndarray:
    """O(1)-per-draw sampling (reference math/AliasTableUtil.java:132-143:
    two RNG calls per sample)."""
    cols = rng.integers(0, len(prob), size=n_draws)
    coin = rng.random(n_draws)
    return np.where(coin < prob[cols], cols, alias[cols])


def random_multigraph_neighbors(
    edges: DataFrame,
    seeds_with_weight: dict[int, float],
    *,
    max_num_samples: int = 10_000,
    max_results: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Returns (id, score, degree) — score = occurrences/max_num_samples."""
    spark = edges.sparkSession
    e = edges.select("src", "dst")
    seed_ids = sorted(seeds_with_weight)
    seed_df = broadcast(
        spark.createDataFrame([(s,) for s in seed_ids], "src bigint")
    )
    # degree(u) for the alias weights (multigraph degree, as the reference)
    deg = {
        r["src"]: r["c"]
        for r in e.join(seed_df, "src").groupBy("src").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    alive = [s for s in seed_ids if deg.get(s, 0) > 0]
    if not alive:
        return spark.createDataFrame([], "id bigint, score double, degree bigint")

    # driver-side seed draws: P(u) ∝ weight(u) * degree(u) (:160-176)
    rng = np.random.default_rng(seed)
    prob, alias = build_alias_table(
        np.array([seeds_with_weight[s] * deg[s] for s in alive])
    )
    draws = sample_alias(prob, alias, max_num_samples, rng)
    counts = np.bincount(draws, minlength=len(alive))
    n_samples_df = broadcast(
        spark.createDataFrame(
            [(int(s), int(c)) for s, c in zip(alive, counts) if c > 0],
            "src bigint, n_samples int",
        )
    )

    # distributed uniform neighbor sampling, seeded per seed node
    adjacency = e.join(n_samples_df, "src")

    def _sample(pdf: pd.DataFrame) -> pd.DataFrame:
        src = int(pdf["src"].iloc[0])
        k = int(pdf["n_samples"].iloc[0])
        g = np.random.default_rng(np.uint64(seed) ^ np.uint64(src & 0x7FFFFFFF))
        nbrs = pdf["dst"].to_numpy()
        picked = nbrs[g.integers(0, len(nbrs), size=k)]
        ids, occ = np.unique(picked, return_counts=True)
        return pd.DataFrame({"dst": ids, "occurrence": occ})

    occurrences = (
        adjacency.groupBy("src")
        .applyInPandas(_sample, schema="dst bigint, occurrence long")
        .groupBy("dst")
        .agg(F.sum("occurrence").alias("occurrence"))
    )
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("degree"))
    return (
        occurrences.join(in_deg, "dst")
        .select(
            F.col("dst").alias("id"),
            (F.col("occurrence") / F.lit(float(max_num_samples))).alias("score"),
            "degree",
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(max_results)
    )
