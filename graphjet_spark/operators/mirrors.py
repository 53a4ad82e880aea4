"""Duplicate-host (mirror) detection over a web corpus.

The crawl-infrastructure pass that finds host pairs serving largely
identical content — mirrored sites, CDN vanity domains, parked
re-hosts — so the frontier stops re-crawling and the training corpus
stops re-ingesting the same site N times (Bharat & Broder, "Mirror,
mirror on the Web: a study of host pairs with replicated content",
WWW'99: their §3 content-signature host-overlap bottom-up method is
the shape implemented here; URL-string similarity, their top-down
method, is intentionally out of scope — it is a candidate generator,
not evidence).

Reference analogue: GraphJet dedups repeated engagement edges per
(user, tweet) before counting (reference graphjet-core/src/main/java/
com/twitter/graphjet/algorithms/counting/TopSecondDegreeByCount.java:
99-103); this is the same keep-one discipline lifted from edges to
whole hosts, which the reference never needs because Twitter has one
canonical host.

Scale shape (100 TB): everything is keyed by content fingerprint or by
host.  The only pair-producing stage is the fingerprint self-join, and
its fan-out per fingerprint is hard-capped at ``max_hosts_per_fp``
choose 2 — fingerprints on more hosts than that are cross-site
boilerplate ("404 not found", cookie banners) whose exclusion IS the
semantics (they carry no mirroring evidence), exactly the df-cap
discipline of :func:`graphjet_spark.operators.dedup.tfidf_cosine_pairs`.
Host sizes are one row per host — broadcast-joined onto the pair
relation, never shuffled against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphjet_spark.functions.hashing import md5_prefix_bigint


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    max_hosts_per_fp: int = 16,
    min_shared: int = 2,
    min_overlap: float = 0.5,
) -> DataFrame:
    """Host pairs with replicated content.

    One row per unordered host pair (``host_a < host_b``) whose
    distinct shared content fingerprints number ``>= min_shared`` and
    cover ``>= min_overlap`` of the smaller host's distinct corpus:
    ``(host_a, host_b, shared_docs, size_a, size_b, overlap,
    jaccard)``.  ``overlap`` = shared / min(size) (Bharat-Broder's
    containment-style mirror score: a small full mirror of a large
    site scores 1.0); ``jaccard`` is reported alongside for the
    symmetric view.  Fingerprint = the cross-engine md5-prefix hash of
    the document text, so the gate twin reproduces values exactly.
    """
    # hf feeds four consumers (sizes, the df-cap, both self-join
    # sides); without a cut each re-derives it from the raw corpus
    # scan.  One lazy checkpoint bounds the corpus to a single pass —
    # everything downstream runs on the distinct (host, fp) relation.
    hf = (
        docs.select(
            F.col(host_col).alias("host"),
            md5_prefix_bigint(F.col(text_col)).alias("fp"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = hf.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    # df-cap: a fingerprint on > max_hosts_per_fp hosts is cross-site
    # boilerplate, not mirroring evidence — dropping it bounds the
    # self-join fan-out at C(max_hosts_per_fp, 2) pairs per fingerprint.
    ok = (
        hf.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") <= max_hosts_per_fp)
        .select("fp")
    )
    capped = hf.join(ok, "fp")
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_docs"))
    )
    out = (
        pairs.join(
            F.broadcast(sizes.withColumnRenamed("n_docs", "size_a")),
            pairs.host_a == F.col("host"),
        )
        .drop("host")
        .join(
            F.broadcast(sizes.withColumnRenamed("n_docs", "size_b")),
            pairs.host_b == F.col("host"),
        )
        .drop("host")
    )
    overlap = F.col("shared_docs") / F.least("size_a", "size_b")
    jacc = F.col("shared_docs") / (
        F.col("size_a") + F.col("size_b") - F.col("shared_docs")
    )
    return (
        out.filter(
            (F.col("shared_docs") >= int(min_shared))
            & (overlap >= float(min_overlap))
        )
        .select(
            "host_a",
            "host_b",
            "shared_docs",
            "size_a",
            "size_b",
            F.round(overlap, 6).alias("overlap"),
            F.round(jacc, 6).alias("jaccard"),
        )
    )
