"""Per-engine-instance precomputed graph tables.

GraphJet keeps its index structures (edge pools, degree arrays) resident
for the lifetime of the server and every query reads them; the Spark
analogue is materializing the deduplicated pair set and both degree
tables ONCE per engine instance and letting every query join against
them (reference: bipartite/segment/LeftIndexedBipartiteGraphSegment.java
keeps degrees adjacent to the adjacency lists for exactly this reason).
Per-query ``distinct().localCheckpoint()`` of the full edge table — the
round-1 pattern — is correct but re-pays the biggest shuffle on every
query; at 100 TB these tables are bucketed parquet written by the ingest
job and queries only scan them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GraphTables:
    """Materialized (src, dst) distinct pair set + degree tables.

    ``pairs``    — distinct (src, dst), localCheckpointed eagerly;
    ``out_deg``  — (src, left_degree);
    ``in_deg``   — (dst, right_degree).
    """

    def __init__(self, edges: DataFrame):
        self.pairs = (
            edges.select("src", "dst").distinct().localCheckpoint(eager=True)
        )
        self.out_deg = (
            self.pairs.groupBy("src")
            .agg(F.count(F.lit(1)).alias("left_degree"))
            .localCheckpoint(eager=True)
        )
        self.in_deg = (
            self.pairs.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("right_degree"))
            .localCheckpoint(eager=True)
        )
