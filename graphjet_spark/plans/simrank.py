"""SimRank structural similarity over the directed edge table.

SimRank (Jeh & Widom, KDD'02): s(a,a) = 1 and for a != b

    s(a,b) = C / (|I(a)| |I(b)|) * sum_{i in I(a), j in I(b)} s(i,j)

with I(v) the in-neighbor set — "two nodes are similar when they are
referenced by similar nodes", the recursive generalization of the
co-citation counting GraphJet's intersection similarity computes one
level deep (reference
graphjet-core/src/main/java/com/twitter/graphjet/algorithms/intersection/IntersectionSimilarity.java
stops at common direct neighbors; SimRank iterates that signal).

Scale design — query-scoped, need-driven, never all-pairs:

* The pair space is derived TOP-DOWN from the requested seed pairs:
  need_0 = Q x Q, need_{t+1} = in-neighbor pairs of need_t.  Each
  expansion is an equi-join of the (tiny) pair frontier against the
  in-edge table — the full |V|^2 SimRank matrix is never formed, and
  the frontier join pushes the dst-in-set semi-join into the edge
  scan.  k iterations touch exactly the pairs k in-steps from the
  seeds, which is the bounded query-time shape GraphJet uses for its
  subgraph SALSA (plans/salsa.py) — depth and seed count cap the
  work, not graph size.
* Values are then computed BOTTOM-UP: s_1 over the deepest need set
  (s_0 is the identity, so the inner sum collapses to the in-neighbor
  intersection count), then each level folds the previous level's
  off-diagonal table plus an exact diagonal count.  All join keys are
  (node, node) pairs — hash-partitioned, map-side-combined aggs.
* In-degrees are the FULL-graph in-degrees (SimRank's definition),
  one map-side-combined pass over the distinct edge set, broadcast
  back by Catalyst (small dim at any scale: it is keyed by the nodes
  appearing in the bounded need sets after the join).

Floats enter only in the per-level (C * total) / (na * nb) expression
and level sums — identical IEEE shape on the DuckDB oracle twin
(oracles.simrank_pairs_sql), final scores rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simrank_pairs(
    edges: DataFrame,
    seeds: list[int],
    *,
    c: float = 0.8,
    iters: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """(node_a, node_b, simrank) for all ordered seed pairs (a != b)
    with a nonzero score after ``iters`` SimRank iterations; pairs
    whose score is exactly 0 (no common ancestry within ``iters``
    in-steps) are omitted, matching the sparse fixpoint."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("n"))
    ea = e.select(F.col("dst").alias("a"), F.col("src").alias("ia"))
    eb = e.select(F.col("dst").alias("b"), F.col("src").alias("ib"))

    # SimRank is symmetric (by induction from the identity base), so
    # every pair table stores the canonical ordering a < b — half the
    # frontier, half the joins; lookups canonicalize via least/greatest
    p0 = spark.createDataFrame(
        [(int(a), int(b)) for a in seeds for b in seeds if a < b],
        "a bigint, b bigint",
    )
    needs = [p0]
    for _ in range(iters - 1):
        nxt = (
            needs[-1]
            .join(ea, "a")
            .join(eb, "b")
            .filter(F.col("ia") != F.col("ib"))
            .select(
                F.least("ia", "ib").alias("a"),
                F.greatest("ia", "ib").alias("b"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        needs.append(nxt)

    s: DataFrame | None = None
    for pair_set in reversed(needs):
        exp = pair_set.join(ea, "a").join(eb, "b")
        diag = (
            exp.filter(F.col("ia") == F.col("ib"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("double").alias("dsum"))
        )
        if s is None:
            tot = diag.select("a", "b", F.col("dsum").alias("tsum"))
        else:
            off = (
                exp.filter(F.col("ia") != F.col("ib"))
                .withColumn("la", F.least("ia", "ib"))
                .withColumn("lb", F.greatest("ia", "ib"))
                .join(
                    s.select(
                        F.col("a").alias("la"),
                        F.col("b").alias("lb"),
                        F.col("s").alias("sv"),
                    ),
                    ["la", "lb"],
                )
                .groupBy("a", "b")
                .agg(F.sum("sv").alias("osum"))
            )
            tot = diag.join(off, ["a", "b"], "outer").select(
                "a",
                "b",
                (
                    F.coalesce("dsum", F.lit(0.0))
                    + F.coalesce("osum", F.lit(0.0))
                ).alias("tsum"),
            )
        s = (
            tot.join(
                indeg.select(F.col("dst").alias("a"), F.col("n").alias("na")),
                "a",
            )
            .join(
                indeg.select(F.col("dst").alias("b"), F.col("n").alias("nb")),
                "b",
            )
            .select(
                "a",
                "b",
                (
                    (F.lit(float(c)) * F.col("tsum"))
                    / (F.col("na") * F.col("nb")).cast("double")
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )

    return s.select(
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        F.round("s", round_to).alias("simrank"),
    )
