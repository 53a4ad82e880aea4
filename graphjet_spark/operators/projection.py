"""One-mode projection of the bipartite interaction graph and temporal
as-of views.

``one_mode_projection`` folds customer→part interactions into a
part↔part co-engagement graph — the classic bipartite projection that
underlies every co-occurrence recommender (GraphJet computes it
implicitly per query inside IntersectionSimilarity, reference
graphjet-core/src/main/java/com/twitter/graphjet/algorithms/
intersection/IntersectionSimilarity.java:118-152; here it is the
explicit materialized table form).  Scale control is the reference's
own F12 per-seed cap: only each left vertex's latest ``cap`` edges (by
the chronological ``seq`` key, MultiSegmentIterator order) participate,
which bounds pair fan-out at cap² per left vertex — hub customers
cannot go quadratic.

``degrees_asof`` is the time-travel read: degrees over the graph as it
existed at a cutoff — the batch analogue of GraphJet reading only
segments older than t (temporally-ordered edge pools).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphjet_spark.operators.degrees import degree_table


def one_mode_projection(
    interactions: DataFrame,
    *,
    min_cooccurrence: int = 2,
    max_edges_per_node: int = 500,
    seq_col: str = "seq",
) -> DataFrame:
    """(a, b, weight) — right-side co-engagement pairs (a < b) with
    weight = number of left vertices engaging both, computed over each
    left vertex's latest ``max_edges_per_node`` edges.

    Plan shape: the F12 cap window already shuffles by ``src``; the
    per-src neighbor set is then folded in place (``collect_set`` state
    bounded at the cap, partitioning reused — no second shuffle) and
    pairs are emitted JVM-side by a double explode.  Two shuffles total
    (window + final pair groupBy) versus the naive
    window→distinct→self-join→groupBy chain's four."""
    w = Window.partitionBy("src").orderBy(F.desc(seq_col))
    neighbor_sets = (
        interactions.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_edges_per_node)
        .groupBy("src")
        .agg(F.collect_set("dst").alias("ds"))
    )
    pairs = (
        neighbor_sets.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a") < F.col("b"))
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
        .where(F.col("weight") >= min_cooccurrence)
    )


def degrees_asof(interactions: DataFrame, cutoff: Column) -> DataFrame:
    """(id, out_degree, in_degree) over the distinct edges whose
    timestamp is <= ``cutoff`` — the graph as it existed then."""
    e = (
        interactions.where(F.col("ts") <= cutoff)
        .select("src", "dst")
        .distinct()
    )
    return degree_table(e)


def butterfly_count(
    interactions: DataFrame,
    *,
    max_edges_per_node: int = 500,
    seq_col: str = "seq",
) -> DataFrame:
    """One-row ``(wedges, butterflies)`` motif census of the bipartite
    graph — butterflies (2x2 bicliques) are the bipartite analogue of
    triangles (Sanei-Mehri et al. KDD'18), the clustering signal for
    engagement graphs like GraphJet's.  Exact integers over each left
    vertex's latest ``max_edges_per_node`` edges (the reference's F12
    cap as the hub fan-out bound, same semantics as
    :func:`one_mode_projection`):

    - wedges = sum over left vertices of C(deg, 2) — co-engagement
      pair slots;
    - butterflies = sum over right pairs of C(w, 2) where w is the
      pair's co-engagement weight (each pair of common left vertices
      closes one butterfly).

    Both folds are map-side-combined aggregations over tables the
    projection already produces; no new join shapes.
    """
    pairs = one_mode_projection(
        interactions,
        min_cooccurrence=2,
        max_edges_per_node=max_edges_per_node,
        seq_col=seq_col,
    )
    w = Window.partitionBy("src").orderBy(F.desc(seq_col))
    wedges = (
        interactions.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_edges_per_node)
        .groupBy("src")
        .agg(F.count_distinct("dst").alias("d"))
        .agg(
            F.sum(F.expr("CAST(d * (d - 1) DIV 2 AS BIGINT)"))
            .cast("bigint")
            .alias("wedges")
        )
    )
    bfly = pairs.agg(
        F.coalesce(
            F.sum(F.expr("CAST(weight * (weight - 1) DIV 2 AS BIGINT)")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("butterflies")
    )
    return wedges.crossJoin(bfly)


def edge_churn_monthly(
    interactions: DataFrame, *, round_to: int = 6
) -> DataFrame:
    """(month_ord, n_edges, retained, added, dropped, churn_rate) — the
    month-over-month distinct-edge delta profile of the interaction
    stream: how many edges persist from the previous month, how many
    are new, how many disappeared (the graph-evolution audit a crawl
    operator reads to spot feed breaks and burst ingests; Leskovec
    KDD'05 densification-style bookkeeping).

    ``month_ord`` = year*12 + month of the interaction timestamp.
    One distinct over (month, src, dst), one self-EQUI-join keyed
    (src, dst, month-1) — the full edge is in the key, so there is no
    fan-out — and one per-month fold over the tiny month table.
    churn_rate = added / n_edges; dropped is NULL when the calendar
    previous month has no observations (no baseline)."""
    em = interactions.select(
        (F.year("ts") * 12 + F.month("ts")).cast("int").alias("m"),
        "src",
        "dst",
    ).distinct()
    n = em.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    prev = em.select(
        (F.col("m") + 1).alias("m"), F.col("src"), F.col("dst")
    )
    ret = (
        em.join(prev, ["m", "src", "dst"])
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained"))
    )
    prev_n = n.select(
        (F.col("m") + 1).alias("m"), F.col("n_edges").alias("prev_n")
    )
    return (
        n.join(ret, "m", "left")
        .join(prev_n, "m", "left")
        .select(
            F.col("m").alias("month_ord"),
            "n_edges",
            F.coalesce("retained", F.lit(0)).cast("bigint").alias("retained"),
            "prev_n",
        )
        .select(
            "month_ord",
            "n_edges",
            "retained",
            (F.col("n_edges") - F.col("retained"))
            .cast("bigint")
            .alias("added"),
            (F.col("prev_n") - F.col("retained"))
            .cast("bigint")
            .alias("dropped"),
            F.round(
                (F.col("n_edges") - F.col("retained")).cast("double")
                / F.col("n_edges").cast("double"),
                round_to,
            ).alias("churn_rate"),
        )
    )


def rec_backtest(
    interactions: DataFrame,
    cutoff: Column,
    *,
    k: int = 5,
    min_cooccurrence: int = 2,
    max_edges_per_node: int = 500,
    round_to: int = 6,
) -> DataFrame:
    """One-row recommender backtest — the product metric behind every
    GraphJet-style co-engagement recommender: build "users who engaged
    X also engaged Y" item pairs from interactions at or before
    ``cutoff`` (the one-mode projection, F12-capped), recommend each
    user their top-``k`` unseen items by summed pair weight, then score
    precision against the user-item engagements that FIRST appear
    after the cutoff.

    Output ``(n_users, n_recs, n_hits, precision)``: exact BIGINTs and
    one rounded division.  All ordering is on (exact integer score
    DESC, item id ASC) so the top-k boundary is cross-engine stable.

    Scale shape: the projection is bounded by the F12 cap and the
    co-occurrence floor; candidate generation joins each user's
    distinct before-items against the (broadcastable at gate scale,
    bucket-joinable beyond) pair table; scoring and the hit join are
    map-side-combined aggregations and semi-join-shaped lookups."""
    before = interactions.where(F.col("ts") <= cutoff)
    sim = one_mode_projection(
        before,
        min_cooccurrence=min_cooccurrence,
        max_edges_per_node=max_edges_per_node,
    )
    sym = sim.select(
        F.col("a").alias("x"), F.col("b").alias("y"), "weight"
    ).unionByName(
        sim.select(F.col("b").alias("x"), F.col("a").alias("y"), "weight")
    )
    user_items = before.select("src", "dst").distinct()
    cand = (
        user_items.join(sym, user_items.dst == sym.x)
        .groupBy("src", "y")
        .agg(F.sum("weight").cast("bigint").alias("score"))
        .join(
            user_items.withColumnRenamed("dst", "y"),
            ["src", "y"],
            "left_anti",
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("y"))
    recs = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("src", "y", "score")
    )
    future = (
        interactions.groupBy("src", "dst")
        .agg(F.min("ts").alias("first_ts"))
        .where(F.col("first_ts") > cutoff)
        .select("src", F.col("dst").alias("y"), F.lit(1).alias("hit"))
    )
    flagged = recs.join(future, ["src", "y"], "left")
    return flagged.agg(
        F.countDistinct("src").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_recs"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
    ).select(
        "n_users",
        "n_recs",
        "n_hits",
        F.when(
            F.col("n_recs") > 0,
            F.round(
                F.col("n_hits").cast("double") / F.col("n_recs"), round_to
            ),
        ).alias("precision"),
    )
