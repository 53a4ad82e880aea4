"""Edge-table build: pages -> hyperlink edge table (FIXTURES.md §2).

The write path of the engine — the analogue of GraphJet's ingestion
(reference: graphjet-demo/src/main/java/com/twitter/graphjet/demo/
TwitterStreamReader.java:129-160 -> bipartite/
LeftIndexedMultiSegmentBipartiteGraph.java:144-158), re-expressed as one
declarative Spark plan:

    pages ──mapInPandas(extract_links)──> raw link rows
          ──xxhash64(url)──> (src, dst, src_url, dst_url, warc_ts, edge_type)

Scale notes (100 TB design):
- extraction is a ``mapInPandas`` Arrow stage: NARROW (no shuffle) —
  each page partition explodes to link rows in place; output partition
  count = input partition count, so partition sizing is controlled
  upstream by ``spark.sql.files.maxPartitionBytes`` on the pages scan.
- only (url, html, warc_ts) are read — column pruning drops text/lang
  at the scan (verified in tests via the physical plan's ReadSchema).
- ids are ``xxhash64(url)`` computed JVM-side (whole-stage codegen), not
  in Python; the id space needs no global coordination (no
  monotonically_increasing_id, no driver bottleneck). Collisions are
  checked by ``assert_no_id_collisions`` (count-distinct, one agg).
- GraphJet maps longs -> dense ints per segment to halve memory
  (bipartite/segment/LeftIndexedBipartiteGraphSegment.java:43-48); we
  keep 64-bit hashes and rely on parquet dictionary + delta encoding.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from graphjet_spark.functions import webtext

_LINKS_SCHEMA = StructType(
    [
        StructField("src_url", StringType()),
        StructField("dst_url", StringType()),
        StructField("warc_ts", TimestampType()),
    ]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        links = webtext.extract_links(pdf["html"], pdf["url"])
        if links.empty:
            continue
        idx = links["page_idx"].to_numpy()
        yield pd.DataFrame(
            {
                "src_url": webtext.canonicalize_url(
                    pdf["url"].iloc[idx].reset_index(drop=True)
                ),
                "dst_url": links["dst_url"].to_numpy(),
                "warc_ts": pdf["warc_ts"].iloc[idx].to_numpy(),
            }
        )


def extract_link_rows(pages: DataFrame) -> DataFrame:
    """pages -> one row per href occurrence (duplicates preserved)."""
    return pages.select("url", "html", "warc_ts").mapInPandas(
        _extract_batches, schema=_LINKS_SCHEMA
    )


_ANCHOR_SCHEMA = StructType(
    [
        StructField("src_url", StringType()),
        StructField("dst_url", StringType()),
        StructField("anchor", StringType()),
    ]
)


def _anchor_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        pairs = webtext.extract_anchors(pdf["html"], pdf["url"])
        if pairs.empty:
            continue
        idx = pairs["page_idx"].to_numpy()
        yield pd.DataFrame(
            {
                "src_url": webtext.canonicalize_url(
                    pdf["url"].iloc[idx].reset_index(drop=True)
                ),
                "dst_url": pairs["dst_url"].to_numpy(),
                "anchor": pairs["anchor"].to_numpy(),
            }
        )


def extract_anchor_rows(pages: DataFrame) -> DataFrame:
    """pages -> one (src_url, dst_url, anchor) row per href occurrence.

    The anchor-text channel of the link extractor: same href resolution
    and canonicalization as :func:`extract_link_rows`, carrying the
    link's inner text.  Narrow Arrow stage, duplicates preserved."""
    return pages.select("url", "html").mapInPandas(
        _anchor_batches, schema=_ANCHOR_SCHEMA
    )


def anchor_text_summary(anchor_rows: DataFrame) -> DataFrame:
    """Per-target anchor-text profile: what OTHER pages call each url.

    ``(dst_url, n_anchor_refs, n_referrers, n_anchor_terms, top_anchor,
    top_anchor_n)`` — total inbound anchor occurrences, distinct
    referring pages, distinct anchor strings, and the modal anchor
    (ties broken by the lexicographically GREATEST anchor, the natural
    order of ``max(struct(n, anchor))``).

    Scale shape: the modal anchor is a two-phase aggregation — first
    groupBy (dst_url, anchor) with map-side combine (absorbs the
    mega-hub's inbound skew), then a groupBy over the far smaller
    per-(dst, distinct-anchor) table.  No window over a hub-sized
    partition anywhere."""
    counts = anchor_rows.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    modal = counts.groupBy("dst_url").agg(
        F.sum("n").cast("bigint").alias("n_anchor_refs"),
        F.count(F.lit(1)).cast("bigint").alias("n_anchor_terms"),
        F.max(F.struct(F.col("n"), F.col("anchor"))).alias("_m"),
    )
    referrers = (
        anchor_rows.select("dst_url", "src_url")
        .distinct()  # pre-shuffle partial distinct absorbs hub skew
        .groupBy("dst_url")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_referrers"))
    )
    return modal.join(referrers, "dst_url").select(
        "dst_url",
        "n_anchor_refs",
        "n_referrers",
        "n_anchor_terms",
        F.col("_m.anchor").alias("top_anchor"),
        F.col("_m.n").alias("top_anchor_n"),
    )


_TEXT_SCHEMA = StructType(
    [StructField("url", StringType()), StructField("text", StringType())]
)


def _text_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {"url": pdf["url"], "text": webtext.extract_text(pdf["html"])}
        )


def extract_text_table(pages: DataFrame) -> DataFrame:
    """pages -> (url, text) via the pinned Arrow-UDF extractor.

    The input_hint per-row invariant: output ``text`` must be
    byte-identical per url to the corpus ``text`` column.  Narrow stage
    (no shuffle), Arrow-batched, no per-row Python.
    """
    return pages.select("url", "html").mapInPandas(
        _text_batches, schema=_TEXT_SCHEMA
    )


def build_edges(pages: DataFrame) -> DataFrame:
    """pages -> edge table (src, dst, src_url, dst_url, warc_ts, edge_type).

    Raw link rows (per-occurrence); callers wanting the simple graph
    apply :func:`simple_graph`.
    """
    return extract_link_rows(pages).select(
        F.xxhash64("src_url").alias("src"),
        F.xxhash64("dst_url").alias("dst"),
        "src_url",
        "dst_url",
        "warc_ts",
        F.lit(0).alias("edge_type"),
    )


def simple_graph(edges: DataFrame) -> DataFrame:
    """Deduplicated (src, dst) pairs — input to the batch algorithms."""
    return edges.select("src", "dst").distinct()


def vertex_table(edges: DataFrame) -> DataFrame:
    """(id, url) — the url<->id dictionary (both endpoints covered)."""
    return (
        edges.select(F.col("src").alias("id"), F.col("src_url").alias("url"))
        .unionByName(
            edges.select(F.col("dst").alias("id"), F.col("dst_url").alias("url"))
        )
        .distinct()
    )


def node_meta_table(pages: DataFrame) -> DataFrame:
    """(id, meta_type, meta_id) — per-vertex metadata (FIXTURES.md §2):
    meta_type 0 = language bucket, 1 = domain id.  The analogue of
    GraphJet's int[][] node metadata (reference: graphjet-core/src/main/
    java/com/twitter/graphjet/bipartite/api/
    NodeMetadataDynamicBipartiteGraph.java:36-56, with HASHTAG/URL slots
    per algorithms/RecommendationType.java:20-24)."""
    base = pages.select(
        F.xxhash64(F.col("url")).alias("id"),
        F.col("lang"),
        F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("domain"),
    )
    lang_meta = base.select(
        "id", F.lit(0).alias("meta_type"), F.crc32(F.col("lang")).alias("meta_id")
    )
    dom_meta = base.select(
        "id", F.lit(1).alias("meta_type"), F.xxhash64(F.col("domain")).alias("meta_id")
    )
    return lang_meta.unionByName(dom_meta).distinct()


def assert_no_id_collisions(vertices: DataFrame) -> None:
    """xxhash64 collision check (FIXTURES.md: 'collision-checked')."""
    row = vertices.agg(
        F.countDistinct("id").alias("ids"), F.countDistinct("url").alias("urls")
    ).first()
    if row["ids"] != row["urls"]:
        raise ValueError(
            f"xxhash64 url collision: {row['urls']} urls -> {row['ids']} ids"
        )


def host_graph(edges: DataFrame) -> DataFrame:
    """``(src_host, dst_host, n_links, n_src_pages)`` — the host-level
    webgraph fold of the page-level edge table (what Common Crawl
    publishes as its "host graph"): inter-domain link occurrence counts
    plus the number of distinct linking pages.  Intra-host rows are
    kept — the internal/external link ratio is a standard crawl-quality
    signal.  One JVM-side regexp projection + one map-side-combined
    aggregation; at 10^12 pages the output is bounded by the (far
    smaller) host-pair count."""
    host = r"^[a-z]+://([^/]+)"
    return (
        edges.select(
            F.regexp_extract("src_url", host, 1).alias("src_host"),
            F.regexp_extract("dst_url", host, 1).alias("dst_host"),
            "src_url",
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_links"),
            F.countDistinct("src_url").cast("bigint").alias("n_src_pages"),
        )
    )


def canonical_url_expr(url):
    """JVM Column twin of :func:`graphjet_spark.functions.webtext.
    canonicalize_url` (kept in lockstep by
    ``tests/test_pages_pipeline.py::test_canonical_url_expr_parity``):
    strip fragment + surrounding whitespace, lowercase the
    ``scheme://host`` origin while preserving path/query case, drop the
    trailing slash on non-root paths.  Pure regexp projection — runs at
    scan rate inside whole-stage codegen, so URL-keyed operators never
    pay an Arrow round trip for canonicalization."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    origin = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)"
    u = F.concat(
        F.lower(F.regexp_extract(u, origin, 1)),
        F.regexp_replace(u, origin, ""),
    )
    return F.regexp_replace(u, r"(?<=[^/])/$", "")


def latest_capture(pages: DataFrame) -> DataFrame:
    """One row per canonical URL: the newest capture wins — the
    Common-Crawl ingest dedup (the same page is re-captured across
    monthly snapshots; the graph/corpus build must see exactly one).

    Winner = max ``warc_ts``; ties break deterministically on
    ``(md5(html), url)`` so re-runs and engine versions agree.  Output
    carries every page column plus ``canonical_url`` and ``n_captures``
    (the capture multiplicity — a crawl-health signal).

    Scale shape: ONE ``max_by`` aggregation keyed on the canonical URL.
    Partial aggregation keeps at most one candidate row per URL per map
    partition, so the shuffle moves ~one page row per distinct URL —
    the minimum any selection must move — and never builds a window
    over hub keys or a self-join.
    """
    row = F.struct(*[F.col(c) for c in pages.columns])
    order = F.struct(
        F.col("warc_ts"), F.md5(F.col("html")).alias("tb"), F.col("url")
    )
    return (
        pages.withColumn("canonical_url", canonical_url_expr(F.col("url")))
        .groupBy("canonical_url")
        .agg(
            F.max_by(row, order).alias("_r"),
            F.count(F.lit(1)).cast("bigint").alias("n_captures"),
        )
        .select("canonical_url", "_r.*", "n_captures")
    )


def resolve_redirects(redirects: DataFrame, rounds: int = 3) -> DataFrame:
    """Transitive redirect-chain resolution by pointer doubling — the
    Common-Crawl ingest step that collapses 301/302/canonical-link
    chains so the graph/corpus build keys on final landing URLs
    (the batch analogue of a crawler chasing ``Location:`` headers;
    GraphJet never sees this layer because its ingest is pre-resolved
    tweet ids — reference graphjet-core/src/main/java/com/twitter/
    graphjet/bipartite/segment/LeftIndexedBipartiteGraphSegment.java:48
    assumes resolved long ids on arrival).

    Input: a functional redirect map ``(src, dst)`` — at most one
    outgoing redirect per ``src``.  Output one row per redirecting
    ``src``: ``(src, final_dst, chain_len, resolved)`` where
    ``final_dst`` is the pointer after ``2**rounds`` hops,
    ``chain_len`` counts hops actually taken, and ``resolved`` is 1
    iff ``final_dst`` itself redirects no further (0 = cycle member or
    a chain longer than ``2**rounds``, reported honestly rather than
    looped forever).

    Scale shape: pointer doubling is ``rounds`` self-joins on a table
    that never grows (functional graphs have |rows| = |redirecting
    urls|), so chains of length L cost ceil(log2 L) shuffles instead
    of L — the only chain-chasing shape that survives 10^12 pages,
    where vanilla iteration on a 30-hop chain would pay 30 full-table
    shuffles.  Each round joins on the current pointer key; no
    windows, no driver-side state.
    """
    # each round consumes the previous pointer table TWICE (both sides
    # of the self-join) — uncut, the recompute tree doubles per round
    # (2**rounds re-derivations of the input).  A lazy checkpoint per
    # round makes every round one scan of the previous round's blocks.
    p = redirects.select(
        "src", "dst", F.lit(1).cast("bigint").alias("chain_len")
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        q = p.select(
            F.col("src").alias("q_src"),
            F.col("dst").alias("q_dst"),
            F.col("chain_len").alias("q_len"),
        )
        p = (
            p.join(q, p["dst"] == q["q_src"], "left")
            .select(
                "src",
                F.coalesce("q_dst", "dst").alias("dst"),
                (F.col("chain_len") + F.coalesce("q_len", F.lit(0)))
                .cast("bigint")
                .alias("chain_len"),
            )
            .localCheckpoint(eager=False)
        )
    heads = redirects.select(F.col("src").alias("dst")).distinct()
    still = heads.withColumn("_h", F.lit(1))
    return p.join(still, "dst", "left").select(
        "src",
        F.col("dst").alias("final_dst"),
        "chain_len",
        F.when(F.col("_h").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("resolved"),
    )
