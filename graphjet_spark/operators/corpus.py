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

from graphjet_spark.functions.hashing import md5_prefix_bigint
from graphjet_spark.operators.textstats import quality_score

HASH_SPACE = 16**15  # md5-prefix range: 15 hex chars = 60 bits


def content_hash60(col: Column) -> Column:
    """Uniform 60-bit integer from content (cross-engine md5 prefix)."""
    return md5_prefix_bigint(col)


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


def pack_sequences(
    docs: DataFrame,
    *,
    seq_len: int = 2048,
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, seq_first, seq_last, n_seqs) —
    GPT-style training-sequence packing: documents are concatenated in
    a deterministic shuffled order (by content-independent md5 hash of
    the doc id, then doc id) and the token stream is cut every
    ``seq_len`` tokens; each doc reports the global offset of its first
    token and the range of training sequences it lands in.

    The global running offset is a **two-phase distributed prefix
    sum** — the only shape that survives 100 TB: range-partition by the
    shuffle key, cumsum *within* each partition (per-partition window,
    never a global single-partition window), then add per-partition
    base offsets computed from the P-row partition-totals table scanned
    once on the driver.  Output is a pure function of the corpus
    (partition-count independent): the eager checkpoint pins partition
    ids so the totals job and the window job see identical boundaries.

    Zero-token documents are dropped (nothing to pack).  All outputs
    are exact BIGINTs — integer DIV, no float division, so the oracle
    matches bit-for-bit at any corpus size.
    """
    spark = docs.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    n_tok = (
        F.when(F.trim(F.col(text_col)) == "", 0).otherwise(ws).cast("bigint")
    )
    base = (
        docs.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            content_hash60(
                F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))
            ).alias("k"),
        )
        .where(F.col("n_tokens") > 0)
        .repartitionByRange(partitions, "k", "doc_id")
        .sortWithinPartitions("k", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        # REQUIRED for correctness, not a perf hint: repartitionByRange
        # samples its boundaries, so without pinning rows the totals
        # job and the window job below could see different pids.
        .localCheckpoint(eager=True)
    )

    totals = {
        r["pid"]: r["t"]
        for r in base.groupBy("pid")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    offs, acc = [], 0
    for pid in sorted(totals):
        offs.append((pid, acc))
        acc += int(totals[pid])
    off_df = spark.createDataFrame(offs, "pid int, part_off bigint")

    from pyspark.sql import Window

    w = (
        Window.partitionBy("pid")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col(
        "part_off"
    )
    last_tok = F.col("start_offset") + F.col("n_tokens") - 1
    return (
        base.join(F.broadcast(off_df), "pid")
        .withColumn("start_offset", start.cast("bigint"))
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            F.expr(f"start_offset DIV {seq_len}").alias("seq_first"),
            last_tok.alias("_lt"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            "seq_first",
            F.expr(f"_lt DIV {seq_len}").alias("seq_last"),
        )
        .withColumn(
            "n_seqs",
            (F.col("seq_last") - F.col("seq_first") + 1).cast("bigint"),
        )
    )


def coverage_select(
    docs: DataFrame, *, k: int = 10, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """``(round, doc_id, gain, covered_total)`` — greedy maximum-
    coverage corpus selection (the classic (1-1/e)-approximate
    submodular data-selection primitive, Nemhauser et al. 1978): round
    r picks the document adding the most not-yet-covered distinct
    tokens (ties to the smaller doc_id) and reports the running covered
    vocabulary.  The coverage-first subset selector behind "pick k
    documents that span the corpus" curation.

    Scale shape per round: one anti-join of the (doc, token) relation
    against the covered-token set (token-keyed, broadcastable while the
    selection is small) and one map-side-combined per-doc count; only
    the argmax row crosses to the driver (k scalar rows total).  Exact
    BIGINT gains — fully value-oracled against k unrolled SQL rounds."""
    from graphjet_spark.operators.dedup import token_sets

    spark = docs.sparkSession
    toks = token_sets(docs, text_col, n).localCheckpoint(eager=True)
    covered = spark.createDataFrame([], "tok string")
    out: list[tuple[int, int, int, int]] = []
    covered_total = 0
    for r in range(1, k + 1):
        gain = (
            toks.join(F.broadcast(covered), "tok", "left_anti")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("gain"))
        )
        top = gain.orderBy(F.desc("gain"), F.asc("doc_id")).first()
        if top is None:
            break
        doc, g = int(top["doc_id"]), int(top["gain"])
        covered_total += g
        out.append((r, doc, g, covered_total))
        covered = (
            covered.unionByName(
                toks.where(F.col("doc_id") == doc).select("tok")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        out, "round int, doc_id bigint, gain bigint, covered_total bigint"
    )


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text)`` —
    split every document into fixed-size token windows with overlap
    (stride = chunk_tokens - overlap): the standard pretraining / RAG
    chunker that pack_sequences' concat-and-chunk is the inverse of.
    Empty documents yield no chunks; the last window is short when the
    tail is short.

    Pure JVM array expressions (split + sequence + slice + explode):
    one narrow projection, no shuffle, scan-rate at any corpus size."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = (
        f"CASE WHEN trim({text_col}) = '' THEN array() "
        f"ELSE split(trim({text_col}), '\\\\s+') END"
    )
    starts = (
        f"CASE WHEN size({toks}) = 0 THEN array() "
        f"ELSE sequence(0, size({toks}) - 1, {stride}) END"
    )
    return docs.select(
        "doc_id",
        F.expr(toks).alias("_w"),
        F.posexplode_outer(F.expr(starts)).alias("chunk_idx", "_s"),
    ).where(F.col("_s").isNotNull()).select(
        "doc_id",
        "chunk_idx",
        (F.col("_s") + 1).cast("int").alias("start_tok"),
        F.least(
            F.lit(chunk_tokens), F.size("_w") - F.col("_s")
        ).cast("int").alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.expr(f"slice(_w, _s + 1, {chunk_tokens})")
        ).alias("chunk_text"),
    )
