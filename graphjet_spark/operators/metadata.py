"""Metadata-rollup recommendations — the HASHTAG/URL rec generator.

Re-expression of the reference's metadata rec path (graphjet-core/src/
main/java/com/twitter/graphjet/algorithms/counting/
TopSecondDegreeByCountTweetMetadataRecsGenerator.java:82-160): candidate
right nodes carry int metadata ids per type (hashtags, urls); the
generator folds candidate weights into per-metadata-id buckets, keeps
ids seen on >= min_count candidates, sorts by weight, trims to top-k.

Spark shape (J5 + A4 + T1): candidates ⋈ node_meta -> groupBy(meta_id)
-> weight sum + provenance -> top-k.  node_meta is a dimension table
(broadcastable at realistic cardinalities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metadata_recs(
    candidates: DataFrame,
    node_meta: DataFrame,
    *,
    meta_type: int,
    max_results: int | None = 10,
    min_candidates: int = 1,
) -> DataFrame:
    """``candidates``: (id, weight) scored right nodes (e.g. output of
    top_second_degree_by_count).  Returns (meta_id, weight, n_candidates,
    sources) ordered weight desc, meta_id asc."""
    joined = candidates.join(
        node_meta.filter(F.col("meta_type") == meta_type).select("id", "meta_id"),
        "id",
    )
    out = (
        joined.groupBy("meta_id")
        .agg(
            F.sum("weight").alias("weight"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.sort_array(F.collect_set("id")).alias("sources"),
        )
        .filter(F.col("n_candidates") >= min_candidates)
        .orderBy(F.desc("weight"), F.asc("meta_id"))
    )
    return out.limit(max_results) if max_results is not None else out
