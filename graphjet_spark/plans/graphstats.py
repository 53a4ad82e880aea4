"""Whole-graph structural statistics: local clustering coefficient,
edge reciprocity, degree assortativity.

These are the standard web-graph health metrics computed over the same
simple directed/undirected views the north-rule algorithms use (the
batch cousins of GraphJet's per-segment degree statistics, reference
graphjet-core/src/main/java/com/twitter/graphjet/stats/ — GraphJet
exposes counters; at batch scale the interesting statistics are the
closed-form structural ones).

Scale notes: clustering reuses the degree-oriented triangle plan
(out-degree bounded by O(sqrt(m)) per vertex, plans/triangles.py);
reciprocity is a single self-equi-join on the distinct edge set;
assortativity is one pass of integer sufficient statistics (exact
BIGINT sums, no floating-point accumulation-order sensitivity) folded
into the Pearson formula in float64 at the very end — the one spot
cross-engine determinism demands care.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphjet_spark.plans.components import symmetrize
from graphjet_spark.plans.triangles import per_vertex_triangles


def local_clustering(
    spark: SparkSession, edges: DataFrame, *, round_to: int = 6
) -> DataFrame:
    """(id, deg, lcc) per vertex of the undirected simple graph:
    lcc = 2*T(v) / (deg(v) * (deg(v)-1)), 0 when deg < 2."""
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    tri = per_vertex_triangles(spark, edges).withColumnRenamed(
        "triangles", "t"
    )
    joined = deg.join(tri, "id", "left").select(
        "id",
        "deg",
        F.coalesce(F.col("t"), F.lit(0)).alias("t"),
    )
    lcc = F.when(
        F.col("deg") >= 2,
        F.lit(2.0)
        * F.col("t").cast("double")
        / (F.col("deg").cast("double") * (F.col("deg").cast("double") - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    return joined.select("id", "deg", F.round(lcc, round_to).alias("lcc"))


def reciprocity(edges: DataFrame, *, round_to: int = 6) -> DataFrame:
    """One row (directed_edges, mutual_edges, reciprocity) over the
    distinct self-loop-free directed edge set: the fraction of directed
    edges whose reverse edge also exists (mutual follow-backs in the
    GraphJet setting)."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count(F.lit(1)).cast("bigint").alias("directed_edges"))
        .crossJoin(
            mutual.agg(F.count(F.lit(1)).cast("bigint").alias("mutual_edges"))
        )
        .select(
            "directed_edges",
            "mutual_edges",
            F.round(
                F.when(
                    F.col("directed_edges") > 0,
                    F.col("mutual_edges").cast("double")
                    / F.col("directed_edges").cast("double"),
                ).otherwise(F.lit(None).cast("double")),
                round_to,
            ).alias("reciprocity"),
        )
    )


def degree_assortativity(edges: DataFrame, *, round_to: int = 6) -> DataFrame:
    """One row (n_ends, assortativity): Pearson correlation of endpoint
    degrees over the symmetrized edge list (Newman 2002, undirected
    form — each edge contributes both orientations).

    All sufficient statistics are exact integer sums (degrees are
    integers), so partial/map-side aggregation order cannot perturb the
    result; the Pearson fold happens once in float64 on the single
    reduced row, making the value bit-stable across engines.  The
    accumulators are 128-bit-class (Spark decimal(38,0) == DuckDB
    HUGEINT): at 10^12 edges with 10^8-degree mega-hubs the dx*dy
    products reach ~10^16 and their sum ~10^28 — far past BIGINT, still
    exact here."""
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    ends = (
        sym.join(deg.select(F.col("id").alias("a"), F.col("d").alias("dx")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("dy")), "b")
        .select(
            F.col("dx").cast("decimal(19,0)").alias("dx"),
            F.col("dy").cast("decimal(19,0)").alias("dy"),
        )
    )
    stats = ends.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    den = F.sqrt(n * F.col("sxx").cast("double") - sx * sx) * F.sqrt(
        n * F.col("syy").cast("double") - sy * sy
    )
    # zero degree variance (regular graphs) leaves the correlation
    # undefined — NULL, matching the oracle's CASE guard
    r = F.when(
        den > 0,
        (n * F.col("sxy").cast("double") - sx * sy) / den,
    ).otherwise(F.lit(None).cast("double"))
    return stats.select(
        F.col("n").alias("n_ends"), F.round(r, round_to).alias("assortativity")
    )


def rich_club(
    spark: SparkSession,
    edges: DataFrame,
    ks: list[int],
    *,
    round_to: int = 6,
) -> DataFrame:
    """(k, n_rich, rich_edges, phi) per degree threshold k: the
    rich-club coefficient phi(k) = 2 E_k / (N_k (N_k - 1)) over the
    vertices of degree > k (Zhou & Mondragon 2004 — how densely the
    hubs interconnect, the classic web/Internet-graph signature).

    One pass: each undirected edge is decorated with both endpoint
    degrees once, then a small broadcast join against the k list counts
    per-threshold edges and vertices — no per-k scan of the graph."""
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    edge_deg = (
        und.join(deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
        .select("da", "db")
    )
    kdf = spark.createDataFrame([(int(k),) for k in ks], "k int")
    e_k = (
        edge_deg.join(
            F.broadcast(kdf),
            (F.col("da") > F.col("k")) & (F.col("db") > F.col("k")),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rich_edges"))
    )
    n_k = (
        deg.join(F.broadcast(kdf), F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rich"))
    )
    return (
        kdf.join(n_k, "k", "left")
        .join(e_k, "k", "left")
        .select(
            "k",
            F.coalesce("n_rich", F.lit(0)).cast("bigint").alias("n_rich"),
            F.coalesce("rich_edges", F.lit(0)).cast("bigint").alias("rich_edges"),
            F.round(
                F.when(
                    F.coalesce("n_rich", F.lit(0)) >= 2,
                    F.lit(2.0)
                    * F.coalesce("rich_edges", F.lit(0)).cast("double")
                    / (
                        F.coalesce("n_rich", F.lit(0)).cast("double")
                        * (F.coalesce("n_rich", F.lit(0)).cast("double") - 1.0)
                    ),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("phi"),
        )
    )


def powerlaw_alpha(
    edges: DataFrame, *, dmin: int = 2, round_to: int = 6
) -> DataFrame:
    """One row (n_tail, dmin, alpha) — maximum-likelihood power-law
    exponent of the degree distribution over the symmetrized graph
    (Clauset, Shalizi & Newman SIAM Rev. 2009, continuous approximation
    for discrete data: alpha = 1 + n / Σ ln(d / (dmin − ½)) over
    vertices with degree ≥ dmin).  THE one-number shape audit of a
    crawled webgraph — a fitted alpha far from ~2.1 flags a broken or
    spam-inflated crawl before any downstream algorithm runs.

    One degree aggregation + one filtered scalar fold; NULL when no
    vertex reaches dmin."""
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    tail = deg.where(F.col("d") >= dmin)
    stats = tail.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum(
            F.log(F.col("d").cast("double") / F.lit(dmin - 0.5))
        ).alias("slog"),
    )
    alpha = F.when(
        F.col("n_tail") > 0,
        F.lit(1.0) + F.col("n_tail").cast("double") / F.col("slog"),
    ).otherwise(F.lit(None).cast("double"))
    return stats.select(
        "n_tail",
        F.lit(dmin).cast("int").alias("dmin"),
        F.round(alpha, round_to).alias("alpha"),
    )


def degree_gini(edges: DataFrame, *, round_to: int = 9) -> DataFrame:
    """One row ``(n_vertices, total_degree, gini)`` — the Gini
    coefficient of the symmetrized degree distribution: the
    one-number concentration audit of a webgraph (0 = egalitarian,
    ->1 = all links at a few hubs); drift between crawls flags hub
    collapse or spam farms like powerlaw_alpha flags shape breaks.

    Skew-free exact form: no global sort over vertices.  Degrees are
    grouped by VALUE (few distinct values on a power-law graph), a
    suffix-free cumulative count over the distinct-value rows gives
    each block's rank range, and
    TW = Σ_v v·(2·c_v·R_prev + c_v(c_v+1)) = 2·Σ_i i·d_(i)
    in decimal(38,0) (overflow-safe at the 10^12-edge design scale,
    the assortativity pattern; the doubled form keeps every
    intermediate an exact integer — no division until the final row).
    G = (TW − (N+1)S) / (N·S) — a single float64 division."""
    from pyspark.sql import Window

    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("d")
    dec = "decimal(38,0)"
    blocks = hist.withColumn(
        "r_prev", (F.sum("c").over(w) - F.col("c")).cast(dec)
    ).select(
        (
            F.col("d").cast(dec)
            * (
                F.lit(2).cast(dec) * F.col("c").cast(dec) * F.col("r_prev")
                + F.col("c").cast(dec) * (F.col("c").cast(dec) + F.lit(1))
            )
        ).alias("w_part"),
        F.col("c").cast(dec).alias("n_part"),
        (F.col("d").cast(dec) * F.col("c").cast(dec)).alias("s_part"),
    )
    agg = blocks.agg(
        F.sum("w_part").alias("w"),
        F.sum("n_part").alias("n"),
        F.sum("s_part").alias("s"),
    )
    gini = (
        F.col("w").cast("double")
        - (F.col("n") + F.lit(1)).cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * F.col("s").cast("double"))
    return agg.select(
        F.col("n").cast("bigint").alias("n_vertices"),
        F.col("s").cast("bigint").alias("total_degree"),
        F.when(
            (F.col("n") > 0) & (F.col("s") > 0), F.round(gini, round_to)
        ).alias("gini"),
    )


def triangle_significance(
    spark, edges: DataFrame, *, round_to: int = 6
) -> DataFrame:
    """One row ``(observed, expected_cfg, ratio)`` — observed triangle
    count vs the configuration-model (degree-preserving null)
    closed-form expectation E[T] = (Σd(d-1))³ / (6·(Σd)³) (Newman,
    SIAM Rev. 2003 §4.2): ratio >> 1 means clustering is REAL structure
    (communities, link farms, boilerplate rings), ratio ≈ 1 means it is
    a pure degree artifact.  The motif-significance audit without
    generating any null graph — just the exact degree moments the
    engine already folds.

    Moments in decimal(38,0) (overflow-safe), the null expectation in
    three float64 ops off the single reduced row; observed reuses the
    degree-oriented triangle plan."""
    from graphjet_spark.plans.triangles import triangle_count

    sym = symmetrize(edges)
    dec = "decimal(38,0)"
    deg = sym.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    mom = deg.agg(
        F.sum(F.col("d").cast(dec)).alias("s1"),
        F.sum(
            F.col("d").cast(dec) * (F.col("d").cast(dec) - F.lit(1))
        ).alias("s2"),
    )
    obs = triangle_count(spark, edges).select(
        F.col("triangles").cast("bigint").alias("observed")
    )
    r = F.col("s2").cast("double") / F.col("s1").cast("double")
    expected = r * r * r / F.lit(6.0)
    return obs.crossJoin(mom).select(
        "observed",
        F.round(expected, round_to).alias("expected_cfg"),
        F.when(
            F.col("s2") > 0,
            F.round(F.col("observed").cast("double") / expected, round_to),
        ).alias("ratio"),
    )
