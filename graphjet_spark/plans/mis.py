"""Maximal independent set via Luby's algorithm (deterministic-hash
form).

Luby (SIAM J. Comput. 1986): each round, every undecided vertex draws
a priority; a vertex joins the MIS iff its priority strictly exceeds
every undecided neighbor's, then it and its neighbors leave the
undecided set.  Converges in O(log n) rounds w.h.p. — the classic
Pregel/BSP algorithm behind distributed coloring, scheduling, and
coarsening.

Here the priority is the cross-engine md5-prefix hash of
("mis:" vertex ":" round) — same family as the hash-walk corpus — so
the MIS is a pure function of the graph and the round budget, and the
gate VALUE-compares it against an unrolled DuckDB twin.  Hash ties
(probability ~n²/2⁶⁰) are handled by neither side winning: both
vertices stay undecided and resolve next round under a fresh hash —
deterministic without any tie-break ordering.

Scale shape per round: one equi-join of the undecided set against the
LIVE edge relation — edges with both endpoints still undecided, shrunk
after every round by anti-joining out the decided delta (the same
frontier discipline as plans/scc.py) — one map-side-combined MAX per
vertex, two anti-joins to shrink the frontier.  Because Luby removes a
constant fraction of edges per round in expectation, rounds after the
first run over geometrically smaller relations instead of re-scanning
the full symmetrized edge set.  State is frontier-sized, not |V|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphjet_spark.functions.hashing import md5_prefix_bigint
from graphjet_spark.plans.components import symmetrize


def _priority(id_col: str, rnd: int):
    s = F.concat(F.lit("mis:"), F.col(id_col).cast("string"), F.lit(f":{rnd}"))
    return md5_prefix_bigint(s)


def _shrink_live(live: DataFrame, removed: DataFrame, partitions: int) -> DataFrame:
    """Drop every live edge touching a just-decided vertex.  Anti-join
    on the (small, delta-sized) removed set twice — by a, then by b so
    the result lands partitioned+sorted by b for the next round's
    neighbor-max sort-merge join."""
    ra = removed.select(F.col("id").alias("a"))
    rb = removed.select(F.col("id").alias("b"))
    return (
        live.join(ra, "a", "left_anti")
        .join(rb, "b", "left_anti")
        .repartition(partitions, "b")
        .sortWithinPartitions("b")
        .localCheckpoint(eager=True)
    )


def luby_mis(
    spark: SparkSession,
    edges: DataFrame,
    *,
    fixed_iters: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """(id, state) over the symmetrized simple graph: 1 = in the MIS,
    0 = excluded (a neighbor is in the MIS), -1 = still undecided when
    the round budget ran out (the oracle-parity fixed-depth mode)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    sym = (
        symmetrize(edges)
        .repartition(partitions, "b")
        .sortWithinPartitions("b")
        .persist()
    )
    vertices = sym.select(F.col("a").alias("id")).distinct()

    und = vertices.localCheckpoint(eager=True)
    live = sym
    mis_parts: list[DataFrame] = []

    for t in range(1, fixed_iters + 1):
        pr = und.select("id", _priority("id", t).alias("h"))
        nbr_max = (
            live.join(pr, live.b == pr.id)
            .groupBy("a")
            .agg(F.max("h").alias("mh"))
        )
        winners = (
            pr.join(nbr_max, pr.id == nbr_max.a, "left")
            .where(F.col("mh").isNull() | (F.col("h") > F.col("mh")))
            .select("id")
            .localCheckpoint(eager=True)
        )
        mis_parts.append(winners)
        # No distinct: left_anti semantics ignore duplicate keys on the
        # right, so deduplicating `removed` would only add a shuffle.
        removed = winners.unionByName(
            live.join(winners, live.a == winners.id).select(
                F.col("b").alias("id")
            )
        ).localCheckpoint(eager=True)
        und = und.join(removed, "id", "left_anti").localCheckpoint(eager=True)
        if t < fixed_iters:
            live = _shrink_live(live, removed, partitions)

    mis = mis_parts[0]
    for p in mis_parts[1:]:
        mis = mis.unionByName(p)
    out = (
        vertices.join(mis.withColumn("s1", F.lit(1)), "id", "left")
        .join(und.withColumn("s2", F.lit(-1)), "id", "left")
        .select(
            "id",
            F.coalesce("s1", "s2", F.lit(0)).cast("int").alias("state"),
        )
    )
    sym.unpersist()
    return out


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    *,
    colors: int = 3,
    mis_iters: int = 6,
    partitions: int | None = None,
) -> DataFrame:
    """(id, color) — distributed greedy graph coloring by iterated
    Luby MIS (Jones & Plassmann '93 family): color c is a maximal
    independent set of the residual graph (vertices not yet colored),
    found with ``mis_iters`` Luby rounds under per-(color, round) hash
    priorities; -1 marks vertices still uncolored when the color
    budget runs out.  Adjacent vertices never share a color >= 0 by
    MIS independence.

    The induced-subgraph restriction is implicit: priorities exist
    only for undecided vertices of the current color, so edges to
    already-colored vertices drop out of the neighbor-max join on
    their own.  Same per-round shape as :func:`luby_mis`."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    sym = (
        symmetrize(edges)
        .repartition(partitions, "b")
        .sortWithinPartitions("b")
        .persist()
    )
    vertices = sym.select(F.col("a").alias("id")).distinct()

    remaining = vertices.localCheckpoint(eager=True)
    live_rem = sym  # edges with both endpoints still uncolored
    colored_parts: list[DataFrame] = []

    for c in range(colors):
        und = remaining
        live = live_rem
        win_parts: list[DataFrame] = []
        for t in range(1, mis_iters + 1):
            s = F.concat(
                F.lit(f"clr:"),
                F.col("id").cast("string"),
                F.lit(f":{c}:{t}"),
            )
            pr = und.select(
                "id",
                md5_prefix_bigint(s).alias("h"),
            )
            nbr_max = (
                live.join(pr, live.b == pr.id)
                .groupBy("a")
                .agg(F.max("h").alias("mh"))
            )
            winners = (
                pr.join(nbr_max, pr.id == nbr_max.a, "left")
                .where(F.col("mh").isNull() | (F.col("h") > F.col("mh")))
                .select("id")
                .localCheckpoint(eager=True)
            )
            win_parts.append(winners)
            removed = winners.unionByName(
                live.join(winners, live.a == winners.id).select(
                    F.col("b").alias("id")
                )
            ).localCheckpoint(eager=True)
            und = und.join(removed, "id", "left_anti").localCheckpoint(
                eager=True
            )
            if t < mis_iters:
                live = _shrink_live(live, removed, partitions)
        wc = win_parts[0]
        for p in win_parts[1:]:
            wc = wc.unionByName(p)
        wc = wc.localCheckpoint(eager=True)
        colored_parts.append(wc.withColumn("color", F.lit(c)))
        remaining = remaining.join(wc, "id", "left_anti").localCheckpoint(
            eager=True
        )
        if c < colors - 1:
            live_rem = _shrink_live(live_rem, wc, partitions)

    colored = colored_parts[0]
    for p in colored_parts[1:]:
        colored = colored.unionByName(p)
    out = vertices.join(colored, "id", "left").select(
        "id", F.coalesce("color", F.lit(-1)).cast("int").alias("color")
    )
    sym.unpersist()
    return out
