"""Similarity search over embedding columns: brute-force cosine top-k
(correctness baseline) and LSH / IVF bucketed variants (scale path).

Scale design: brute-force is a broadcast of the (small) query set
against the full embedding table — one narrow pass, no shuffle, exact.
The bucketed variants cut the candidate set per query to one bucket
(+probes): random-hyperplane LSH needs no training; IVF picks coarse
centroids from a seeded sample (k-means one pass) and probes the
``n_probe`` nearest cells — both turn top-k search into a bucket-key
equi-join, the same shape as the dedup LSH joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _as_double(vec_col: str):
    return F.transform(vec_col, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (queries drawn from
    the same table). Output (query_id, neighbor_id, cosine) with
    cosine rounded to 6 and the top-k boundary taken on the rounded
    value (ties -> smaller neighbor_id) so results are reproducible
    across engines.  All float64 JVM-side arithmetic."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    v = embeddings.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v"), norm.alias("nrm")
    )
    q = broadcast(
        v.join(
            broadcast(
                v.sparkSession.createDataFrame(
                    [(int(i),) for i in query_ids], "id bigint"
                )
            ),
            "id",
        ).select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        v.crossJoin(q)
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(dot / (F.col("nrm") * F.col("qnrm")), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH.

    Each of ``n_tables`` hash tables buckets vectors by the sign pattern
    of ``n_planes`` random projections; a query only scores vectors
    sharing a bucket in >= 1 table.  Candidate generation is an
    equi-join on (table, bucket) — at 100 TB the embedding table is
    hash-partitioned by the bucket key and the probe side is broadcast.
    Output schema matches brute_force_topk.
    """
    spark = embeddings.sparkSession
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_b = spark.sparkContext.broadcast(planes)

    def _bucketize(batches):
        P = planes_b.value
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            rows = {"id": pdf[id_col].to_numpy()}
            frames = []
            for t in range(P.shape[0]):
                signs = (vecs @ P[t].T) > 0  # (n, n_planes)
                bucket = (signs * (1 << np.arange(P.shape[1]))).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {"id": rows["id"], "tbl": t, "bucket": bucket.astype(np.int64)}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    buckets = embeddings.select(id_col, vec_col).mapInPandas(
        _bucketize, schema="id bigint, tbl int, bucket bigint"
    )
    qb = broadcast(
        buckets.join(
            broadcast(
                spark.createDataFrame([(int(i),) for i in query_ids], "id bigint")
            ),
            "id",
        ).select(
            F.col("id").alias("query_id"), "tbl", "bucket"
        )
    )
    cand = (
        buckets.join(qb, ["tbl", "bucket"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .distinct()
    )
    # score only the candidates (exact cosine on the reduced set)
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    v = embeddings.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v"), norm.alias("nrm")
    )
    qv = broadcast(
        v.join(
            broadcast(
                spark.createDataFrame([(int(i),) for i in query_ids], "id bigint")
            ),
            "id",
        ).select(F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(v, cand.neighbor_id == v.id)
        .join(qv, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("nrm") * F.col("qnrm")), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
