"""Count-based n-gram language modeling for corpus quality filtering.

CCNet (Wenzek et al., LREC 2020) ranks Common Crawl documents by the
perplexity of a Kneser-Ney language model (KenLM) and keeps the
low-perplexity head — the single most widely replicated quality filter
in LLM data pipelines (CCNet, RedPajama, FineWeb all ship a variant).
This module trains the model and scores the corpus in one Spark job:
interpolated Kneser-Ney bigram probabilities (Kneser & Ney, ICASSP'95;
the interpolated form from Chen & Goodman, "An empirical study of
smoothing techniques for language modeling", Harvard TR-10-98 §2.7)
estimated from exact distributed counts, then per-document perplexity
under that model.

Beyond-reference: GraphJet has no text modeling; the closest reference
discipline is the exact-count-then-score shape of its similarity
normalizations (reference graphjet-core/src/main/java/com/twitter/
graphjet/algorithms/intersection/CosineUpdateNormalization.java — raw
co-occurrence counts folded through a closed-form score), which is the
same two-phase pattern used here on bigram counts.

Scale shape (100 TB): bigram extraction is a doc-keyed window (group
size = document length); all model tables are exact counts produced by
map-side-combined groupBys keyed by (w1, w2), w1, or w2 — each bounded
by the distinct-bigram count, which grows sublinearly in corpus size.
The only driver-side value is the single distinct-bigram total (1-row
crossJoin, the repo's scalar pattern).  Per-doc scoring is one
bigram-keyed equi-join of corpus occurrences against the model —
corpus-linear, no pair fan-out anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DISCOUNT = 0.75  # Chen & Goodman's fixed absolute discount


def _bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent whitespace-token pair."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.select(
            "doc_id",
            F.lag("tok").over(w).alias("w1"),
            F.col("tok").alias("w2"),
        )
        .filter(F.col("w1").isNotNull())
    )


def kn_bigram_model(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Interpolated Kneser-Ney bigram model from exact corpus counts.

    One row per distinct corpus bigram: ``(w1, w2, c, p_kn)`` with

    ``p_kn = (c - D)/c(w1·) + (D·N1+(w1·)/c(w1·)) · (N1+(·w2)/T)``

    where ``c(w1·)`` is the left-context total, ``N1+(w1·)`` the
    distinct continuations of ``w1``, ``N1+(·w2)`` the distinct left
    contexts of ``w2`` (the continuation counts that make Kneser-Ney
    Kneser-Ney), and ``T`` the distinct-bigram total.  ``c >= 1`` for
    every emitted row, so the ``max(c - D, 0)`` clamp never binds.
    """
    bi = _bigrams(docs, text_col, id_col)
    # cbi feeds four consumers (cw1, cw2, tot, the model join); without
    # a cut each re-derives it from the raw corpus scan — 4 full passes
    # at 100 TB.  One lazy checkpoint bounds the corpus to a single
    # scan; everything downstream runs on the distinct-bigram relation
    # (sublinear in corpus size).
    cbi = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    cw1 = cbi.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    cw2 = cbi.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n2b"))
    tot = cbi.agg(F.count(F.lit(1)).cast("double").alias("t"))
    d = F.lit(DISCOUNT)
    p = (F.col("c") - d) / F.col("c1") + (d * F.col("n1f") / F.col("c1")) * (
        F.col("n2b") / F.col("t")
    )
    return (
        cbi.join(cw1, "w1")
        .join(cw2, "w2")
        .crossJoin(F.broadcast(tot))  # 1-row scalar: distinct-bigram total
        .select("w1", "w2", "c", p.alias("p_kn"))
    )


def kn_bigram_topk(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """The ``k`` most frequent corpus bigrams with their smoothed
    probabilities, ordered by ``(c desc, w1, w2)`` — an exact unique
    sort key, so the LIMIT boundary is cross-engine stable."""
    m = kn_bigram_model(docs, text_col, id_col)
    return (
        m.select("w1", "w2", "c", F.round("p_kn", round_to).alias("p_kn"))
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(int(k))
    )


def kn_doc_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document perplexity under the corpus's own KN bigram model
    (the CCNet ranking signal): ``exp(-mean(ln p_kn(w_i | w_{i-1})))``
    over the document's adjacent-token pairs.  Documents with fewer
    than two tokens have no bigram evidence and are dropped.  Model
    and corpus come from the same data, so every scored bigram exists
    in the model (inner join loses nothing)."""
    bi = _bigrams(docs, text_col, id_col)
    m = kn_bigram_model(docs, text_col, id_col)
    return (
        bi.join(m, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.exp(-F.avg(F.log("p_kn"))), round_to).alias(
                "perplexity"
            ),
        )
    )
