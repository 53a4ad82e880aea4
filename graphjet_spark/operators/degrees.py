"""Degree tables and top-k-by-degree queries.

GraphJet analogues: O(1) ``getLeftNodeDegree``/``getRightNodeDegree``
(reference: graphjet-core/src/main/java/com/twitter/graphjet/bipartite/
api/LeftIndexedBipartiteGraph.java:47, summed across segments at
bipartite/LeftIndexedMultiSegmentBipartiteGraph.java:166-178) and the
demo's top-k-by-degree servlets with recency (larger-id) tie-break
(graphjet-demo/src/main/java/com/twitter/graphjet/demo/
TopTweetsServlet.java:53-99, tie-break at :77-81).

In the batch engine the degree index is a materialized aggregate table,
refreshed with the edge table; a point lookup is a broadcast-join/filter
against it.  The aggregation is two-phase (map-side combine) by
construction, so hub skew never concentrates rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(edges: DataFrame) -> DataFrame:
    """Per-vertex (id, out_degree, in_degree); 0 where absent."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def top_k_by_degree(
    edges: DataFrame, k: int, side: str = "right"
) -> DataFrame:
    """Top-k nodes by degree, ties toward larger id (more recent —
    TopTweetsServlet.java:77-81 semantics).  ``side='right'`` ranks
    ``dst`` nodes by in-degree, ``'left'`` ranks ``src`` by out-degree.
    """
    key = "dst" if side == "right" else "src"
    deg = edges.groupBy(F.col(key).alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return deg.orderBy(F.desc("degree"), F.desc("id")).limit(k)
