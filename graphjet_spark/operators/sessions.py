"""Gap-based event sessionization.

The batch form of the classic stream-sessionization operator (the
Structured-Streaming ``session_window`` analogue, computed exactly over
the stored event log): per user, order events by time, cut a new
session whenever the gap to the previous event exceeds the threshold,
then roll sessions up per user.

All arithmetic is exact BIGINT epoch-microseconds (no float time math),
so the output is bit-identical across engines.  Plan shape: one window
over (user, time) — the state never exceeds a user's own events, so the
shuffle is by user and skew follows the activity distribution (at
100 TB a mega-user is bounded by their own event count, and the
two-level rollup keeps the reduce side narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    gap_us: int = 6 * 3600 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_id, n_events, span_us) — one row per session;
    ``session_id`` is the 1-based per-user session ordinal."""
    # parquet timestamps read as TIMESTAMP_NTZ; the session timezone is
    # pinned to UTC (session.py), so the cast is offset-free and the
    # epoch agrees with DuckDB's epoch_us over the same naive values
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy("us", id_col)
    flagged = (
        events.select(user_col, us.alias("us"), id_col)
        .withColumn("prev", F.lag("us").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | ((F.col("us") - F.col("prev")) > F.lit(gap_us)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("new_s").over(w))
    )
    return flagged.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("us") - F.min("us")).cast("bigint").alias("span_us"),
    )


def session_stats(
    events: DataFrame, *, gap_us: int = 6 * 3600 * 1_000_000
) -> DataFrame:
    """(user_id, n_sessions, max_session_events, max_session_span_us) —
    per-user session profile."""
    s = sessionize(events, gap_us=gap_us)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
        F.max("span_us").cast("bigint").alias("max_session_span_us"),
    )


def event_burstiness(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """(user_id, n_gaps, total_gap_us, burstiness) — per-user
    inter-event gap statistics: burstiness B = (sigma - mu) /
    (sigma + mu) (Goh & Barabasi 2008; B → -1 periodic, 0 Poisson,
    → 1 bursty).

    Gaps are exact BIGINT microseconds; mu/sigma come from exact
    integer sufficient statistics (sum, sum of squares in
    128-bit-class accumulators) folded to float64 on the per-user row.
    The gap total is reported as the exact integer (the mean is
    total/n): rounding a ~1e10-µs float mean to 6 decimals sits past
    float64's 16 significant digits, where engine ROUND
    implementations legitimately disagree by one ULP — only the
    O(1)-magnitude burstiness is a rounded double.  Users with a
    single event (no gaps) are omitted."""
    w = Window.partitionBy(user_col).orderBy("us", id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(user_col, us.alias("us"), id_col)
        .withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            user_col,
            (F.col("us") - F.col("prev")).cast("decimal(19,0)").alias("g"),
        )
    )
    st = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("sg").cast("double") / n
    var = F.col("sgg").cast("double") / n - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return st.select(
        user_col,
        "n_gaps",
        F.col("sg").cast("bigint").alias("total_gap_us"),
        F.round(
            F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)).otherwise(
                F.lit(0.0)
            ),
            round_to,
        ).alias("burstiness"),
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """(type_from, type_to, cnt, p) — the corpus-wide event-type
    transition matrix: consecutive same-user event pairs ordered by
    time, with row-normalized probabilities (the first-order Markov
    statistics a behavior model trains on).  One per-user window + one
    corpus-wide aggregate, both map-side combined."""
    w = Window.partitionBy(user_col).orderBy("us", id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pairs = (
        events.select(
            user_col, us.alias("us"), id_col, F.col(type_col).alias("t")
        )
        .withColumn("nxt", F.lead("t").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("t").alias("type_from"), F.col("nxt").alias("type_to"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    row_tot = pairs.groupBy("type_from").agg(
        F.sum("cnt").cast("bigint").alias("tot")
    )
    return pairs.join(row_tot, "type_from").select(
        "type_from",
        "type_to",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.col("tot").cast("double"),
            round_to,
        ).alias("p"),
    )


def markov_backtest(
    events: DataFrame,
    cutoff: Column,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """One-row next-event prediction backtest: train the first-order
    Markov transition matrix (:func:`event_transitions`) on consecutive
    same-user pairs whose LATTER event is at or before ``cutoff``,
    predict each later pair's next type as the argmax row of the
    matrix (count DESC, type ASC tie-break), and report accuracy —
    the behavior-model evaluation as one reproducible row.

    Pairs whose from-type never appeared in training have no
    prediction and count as incorrect (the honest denominator).
    Exact BIGINT counts, one rounded division."""
    cutoff_us = F.unix_micros(cutoff.cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy("us", id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pairs = (
        events.select(
            user_col, us.alias("us"), id_col, F.col(type_col).alias("t")
        )
        .withColumn("nxt", F.lead("t").over(w))
        .withColumn("nxt_us", F.lead("us").over(w))
        .where(F.col("nxt").isNotNull())
    )
    train = (
        pairs.where(F.col("nxt_us") <= cutoff_us)
        .groupBy(F.col("t").alias("type_from"), F.col("nxt").alias("type_to"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    pw = Window.partitionBy("type_from").orderBy(
        F.desc("cnt"), F.asc("type_to")
    )
    pred = (
        train.withColumn("rn", F.row_number().over(pw))
        .where(F.col("rn") == 1)
        .select("type_from", F.col("type_to").alias("predicted"))
    )
    ev = pairs.where(F.col("nxt_us") > cutoff_us).select(
        F.col("t").alias("type_from"), F.col("nxt").alias("actual")
    )
    scored = ev.join(F.broadcast(pred), "type_from", "left")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(
            F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    ).select(
        "n_eval",
        "n_correct",
        F.when(
            F.col("n_eval") > 0,
            F.round(
                F.col("n_correct").cast("double") / F.col("n_eval"),
                round_to,
            ),
        ).alias("accuracy"),
    )
