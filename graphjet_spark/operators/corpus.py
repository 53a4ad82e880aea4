"""Corpus-level selection operators: deterministic hash-threshold
sampling and per-source quality rollups.

The sampler is the scale-correct stateless form: a document is kept
iff a content-derived 60-bit integer falls below ``frac * 2^60`` for
its stratum — no global sort, no window, no state; the decision is a
pure row-local expression, so it distributes trivially and is
reproducible across engines and runs (the batch analogue of GraphJet's
deterministic edge-sampling seeds, reference graphjet-core/src/main/
java/com/twitter/graphjet/bipartite/segment/
LeftIndexedBipartiteGraphSegment.java edge-insertion determinism).

The 60-bit integer is the cross-engine md5-prefix hash (the repo's one
engine-portable hash): Spark ``conv(substr(md5(s),1,15),16,10)`` ==
DuckDB ``('0x'||substr(md5(s),1,15))::BIGINT``, uniform over
[0, 16^15).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphjet_spark.operators.textstats import quality_score

HASH_SPACE = 16**15  # md5-prefix range: 15 hex chars = 60 bits


def content_hash60(col: Column) -> Column:
    """Uniform 60-bit integer from content (cross-engine md5 prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash_threshold_sample(
    docs: DataFrame,
    frac_by_lang: dict[str, float],
    *,
    default_frac: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang) — keep each document iff its content hash falls
    under its language's threshold: a deterministic, stateless,
    stratified Bernoulli sample (exactly reproducible, no RNG)."""
    thresholds = [
        (lang, int(frac * HASH_SPACE)) for lang, frac in frac_by_lang.items()
    ]
    thr = F.lit(int(default_frac * HASH_SPACE))
    for lang, t in thresholds:
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    return (
        docs.select("doc_id", "lang", content_hash60(F.col(text_col)).alias("h"))
        .where(F.col("h") < thr)
        .select("doc_id", "lang")
    )


def source_quality_rollup(
    docs: DataFrame,
    *,
    quality_floor: float = 0.7,
    min_mean_quality: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, mean_quality, pass_rate, keep) — per-provenance
    quality profile with a keep/drop verdict: the crawl-source triage
    table every training-data pipeline maintains (drop a feed, not a
    document, when the whole feed is junk)."""
    q = quality_score(docs, text_col).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.round(
            F.avg((F.col("quality") >= quality_floor).cast("double")), 6
        ).alias("pass_rate"),
    ).select(
        "source",
        "n_docs",
        "mean_quality",
        "pass_rate",
        (F.col("mean_quality") >= min_mean_quality).alias("keep"),
    )
