"""Crawl-scheduling estimators over page revisit histories.

A frontier that re-crawls every URL at the same cadence wastes almost
all of its fetch budget — most pages never change, a few change hourly.
The standard fix (Cho & Garcia-Molina, "Estimating frequency of change",
ACM TOIT 3(3), 2003) models each page as a Poisson change process and
estimates its rate λ from the change/no-change outcomes of past visits;
the scheduler then revisits in proportion to the estimated rate and the
staleness risk.  This module implements their estimators as a single
group-by over the capture log.

Beyond-reference: GraphJet ingests a firehose and never re-reads an
edge, so it has no revisit scheduling; the closest reference discipline
is the recency prioritization of its segment rollover (reference
graphjet-core/src/main/java/com/twitter/graphjet/bipartite/segment/
LeftIndexedBipartiteGraphSegment.java keeps only the newest segments
live), which is the "newest data matters most" assumption this operator
quantifies per URL.

Scale shape (100 TB): one narrow shuffle keyed by URL (the lag window
and the per-URL aggregate share it), per-URL group size = the visit
count (tens), no joins, no pair fan-out.  Output is one row per URL —
strictly smaller than the input log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphjet_spark.functions.hashing import md5_prefix_bigint

_DAY_S = 86_400.0


def page_change_rate(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_epoch",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-URL Poisson change-rate estimates from a capture log.

    Input: one row per (url, visit) with an epoch-seconds timestamp and
    the fetched content (fingerprinted internally with the cross-engine
    md5-prefix hash).  Consecutive visits whose fingerprints differ are
    the observed "changes".  Output, one row per URL with >= 1 interval:

    - ``n_captures``, ``n_changes``, ``span_s`` — the raw evidence;
    - ``lambda_naive_day`` — changes per day, X / span (the biased
      estimator: it can never exceed the visit rate);
    - ``lambda_cgm_day`` — Cho & Garcia-Molina's improved estimator
      ``-ln((n - X + 0.5) / (n + 0.5)) / Ī`` (their §4.2, the
      bias-corrected form that stays finite at X = n), scaled to /day,
      with Ī the mean inter-visit gap;
    - ``p_stale_1d`` — ``1 - exp(-λ̂ · 1d)``: the probability the page
      has changed within a day of a fresh crawl, i.e. the staleness
      risk a once-a-day revisit policy accepts for this URL.
    """
    ts = F.col(ts_col).cast("long")
    w = Window.partitionBy("url").orderBy("ts")
    fp = md5_prefix_bigint(F.col(text_col))
    marked = captures.select(
        F.col(url_col).alias("url"),
        ts.alias("ts"),
        fp.alias("fp"),
    ).withColumn("prev_fp", F.lag("fp").over(w))
    agg = marked.groupBy("url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_captures"),
        F.sum(
            F.when(
                F.col("prev_fp").isNotNull()
                & (F.col("fp") != F.col("prev_fp")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changes"),
        (F.max("ts") - F.min("ts")).cast("bigint").alias("span_s"),
    )
    return change_rate_from_stats(agg, round_to=round_to)


def change_rate_from_stats(
    stats: DataFrame, round_to: int = 6
) -> DataFrame:
    """The estimator half of :func:`page_change_rate`, over already
    reduced per-URL sufficient statistics ``(url, n_captures,
    n_changes, span_s)`` — shared with the streaming fold
    (:func:`graphjet_spark.streaming.ingest.read_change_rates`), whose
    state is exactly these mergeable statistics."""
    n = (F.col("n_captures") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    span = F.col("span_s").cast("double")
    ibar = span / n
    lam_cgm = -F.log((n - x + 0.5) / (n + 0.5)) / ibar
    return (
        stats.filter(F.col("span_s") > 0)
        .select(
            "url",
            "n_captures",
            "n_changes",
            "span_s",
            F.round(x / span * _DAY_S, round_to).alias("lambda_naive_day"),
            F.round(lam_cgm * _DAY_S, round_to).alias("lambda_cgm_day"),
            F.round(1.0 - F.exp(-lam_cgm * _DAY_S), round_to).alias(
                "p_stale_1d"
            ),
        )
    )
