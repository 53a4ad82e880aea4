"""Mergeable frequency sketches: count-min over an event/key stream.

Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
depth x width counter grid; key k increments counter
(row, h_row(k) mod width) for each row, and its frequency estimate is
the MIN over rows of its counters — always >= the true count, with
overestimate bounded by (N/width) per row.  THE workhorse of web-scale
approximate analytics (heavy hitters, per-key rate limits, join-size
estimation) because the counter grid is tiny, build is one pass, and
grids are MERGEABLE: counters built per segment/partition/day sum
cell-wise into the grid of the union (tested).  GraphJet's own degree
estimation serves point frequencies from per-segment structures the
same way (reference graphjet-core/src/main/java/com/twitter/graphjet/
bipartite/segment/LeftIndexedBipartiteGraphSegment.java:43-58).

The row hashes are the cross-engine md5-prefix BIGINT, so the sketch
is a pure function of the data — the gate VALUE-compares estimates
against a DuckDB twin computing the identical grid.

Scale shape: build = one narrow explode to ``depth`` rows per input
row, then ONE map-side-combined groupBy whose reduced state is at most
depth x width cells (constant, broadcastable).  Estimation joins the
query keys (broadcast) against the grid.  No shuffle grows with input
size beyond the single count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from graphjet_spark.functions.hashing import md5_prefix_bigint as _h


def _bucket(key_str: F.Column, row: F.Column, width: int) -> F.Column:
    return _h(
        F.concat(
            F.lit("cms:"), row.cast("string"), F.lit(":"), key_str
        )
    ) % F.lit(width)


def cms_counters(
    df: DataFrame, key_col: str, *, width: int = 64, depth: int = 4
) -> DataFrame:
    """``(row, bucket, cnt)`` count-min grid over ``df[key_col]``.
    Cell-wise additive: grids of disjoint slices sum to the grid of
    their union."""
    row = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    keyed = df.select(F.col(key_col).cast("string").alias("k")).select(
        "k", row
    )
    return (
        keyed.select(
            "row", _bucket(F.col("k"), F.col("row"), width).alias("bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """``(key, est_cnt)`` — MIN over rows of the key's counters (0 for
    a never-seen bucket).  ``keys`` is expected to be small (the query
    set); the probe fans each key to ``depth`` grid lookups."""
    row = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.col(key_col).cast("string").alias("k"),
    ).select("key", "k", row)
    probes = probes.select(
        "key", "row", _bucket(F.col("k"), F.col("row"), width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est_cnt")
        )
    )


# ---------------------------------------------------------------- HLL

# h = md5-prefix BIGINT < 2^60; bucket consumes log2(m) bits via
# h % m, the quotient q = h DIV m fits (60 - log2(m)) bits, so
# rho = window + 1 - bitlen(q) lies in [1, window + 1]
def _hll_window(m: int) -> int:
    if m & (m - 1) or m < 2:
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    return 60 - (m.bit_length() - 1)


def _alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    *,
    m: int = 64,
) -> DataFrame:
    """HyperLogLog register table ``(group..., bucket, mx)`` (Flajolet
    et al. AofA'07): mx = max over keys of the leading-zero rank of the
    key hash's 54-bit quotient.  Registers merge by cell-wise MAX —
    grids of slices max into the grid of the union.  All integer bit
    arithmetic (LENGTH(BIN(q)) bit-length, no floating log2), identical
    on both engines."""
    h = _h(
        F.concat(F.lit("hll:"), F.col(key_col).cast("string"))
    )
    base = df.select(*group_cols, h.alias("h"))
    w1 = _hll_window(m) + 1
    q = F.expr(f"h DIV {m}")
    rho = (
        F.when(q == 0, F.lit(w1))
        .otherwise(F.lit(w1) - F.length(F.bin(q)))
        .cast("int")
    )
    return (
        base.select(
            *group_cols,
            (F.col("h") % F.lit(m)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("mx"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    *,
    m: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """``(group..., hll_est)`` — the HLL cardinality estimate with the
    standard small-range (linear-counting) correction.  The harmonic
    denominator is folded in EXACT BIGINT arithmetic
    (sum of 1 << (w1 - mx), absent registers contribute 1 << w1), so
    the only floats are one division and one optional ln — cross-engine
    stable at round 4."""
    w1 = _hll_window(m) + 1
    num = _alpha(m) * m * m * float(2**w1)  # one shared double literal
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w1} - mx)"))
        .cast("bigint")
        .alias("s_present"),
    )
    s_total = F.col("s_present") + (F.lit(m) - F.col("present")) * F.lit(
        1 << w1
    ).cast("bigint")
    raw = F.lit(num) / s_total.cast("double")
    empty = F.lit(m) - F.col("present")
    est = F.when(
        (raw < F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, round_to).alias("hll_est")
    )


# -------------------------------------------------------------- Bloom

def _bloom_bit(key_str: F.Column, i: F.Column, m_bits: int) -> F.Column:
    """Bit position of hash function ``i`` for ``key_str``: md5-prefix
    of ``key || ':' || i`` mod m.  60-bit positive hash, so plain ``%``
    is identical in Spark and DuckDB."""
    return _h(F.concat(key_str, F.lit(":"), i.cast("string"))) % F.lit(
        m_bits
    )


def bloom_bits(
    df: DataFrame, key_col: str, *, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """``(bit)`` — the DISTINCT set-bit positions of a Bloom filter
    (Bloom, CACM 1970) over ``df[key_col]``: k md5-prefix hash probes
    per key, each mod ``m_bits``.  At most ``m_bits`` rows regardless
    of input size, so the built filter always broadcasts.  Filters are
    MERGEABLE by construction: the bit set of a union of slices is the
    distinct-union of the slices' bit sets (one more ``.distinct()``),
    the membership analogue of CMS cell-sums / HLL cell-maxes above.

    Scale shape: one narrow k-way explode + a distinct whose reduced
    state is <= m_bits rows — the fixed-size membership summary that
    replaces shipping the full key set to every probe site at 100 TB."""
    i = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("i")
    return (
        df.select(F.col(key_col).cast("string").alias("s"))
        .select("s", i)
        .select(_bloom_bit(F.col("s"), F.col("i"), m_bits).alias("bit"))
        .distinct()
    )


def bloom_member_flags(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Rows of ``probes`` whose ``key_col`` tests POSITIVE against the
    Bloom bit set (all k probe bits present).  One-sided error: every
    true member passes (no false negatives, tested); non-members pass
    with probability ~ fill_ratio**k.  The bit set joins broadcast
    (<= m_bits rows); membership is a per-row k-probe lookup, so the
    probe side streams at scan rate with no key-set shuffle.  Rows are
    tagged with a per-row id before the k-way explode so duplicate
    probe rows count their k hits independently (a naive groupBy over
    the payload columns would merge duplicates into dup_count*k hits
    and reject true members); output multiplicity matches the input.
    The tagged frame is eagerly localCheckpoint'ed so the per-row ids
    are PINNED before the probe join — monotonically_increasing_id is
    partition-layout-dependent, and without the pin a task retry after
    an upstream shuffle could re-derive different tags between the join
    and the groupBy, merging or splitting probe rows."""
    i = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("i")
    cols = probes.columns
    tagged = probes.withColumn(
        "_rid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    probed = tagged.select(
        "_rid", *cols, F.col(key_col).cast("string").alias("_s")
    ).select("_rid", *cols, i, F.col("_s"))
    probed = probed.select(
        "_rid",
        *cols,
        _bloom_bit(F.col("_s"), F.col("i"), m_bits).alias("bit"),
    )
    return (
        probed.join(F.broadcast(bits), "bit")
        .groupBy("_rid", *cols)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .where(F.col("_hits") == k)
        .drop("_hits", "_rid")
    )
