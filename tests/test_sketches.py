"""Count-min sketch: literal mirror, overestimate bound, mergeability
(the property that makes the sketch a distributed/streaming structure).
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from graphjet_spark.operators.sketches import cms_counters, cms_estimate

WIDTH, DEPTH = 16, 3


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_cms(keys, width=WIDTH, depth=DEPTH):
    grid: dict[tuple[int, int], int] = defaultdict(int)
    for k in keys:
        for r in range(depth):
            grid[(r, _md5i(f"cms:{r}:{k}") % width)] += 1
    return grid


def py_est(grid, key, width=WIDTH, depth=DEPTH):
    return min(
        grid.get((r, _md5i(f"cms:{r}:{key}") % width), 0)
        for r in range(depth)
    )


def _keys_df(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], "user_id bigint")


def test_cms_counters_literal_mirror(spark):
    keys = [i % 37 for i in range(400)] + [5] * 50 + [99] * 30
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_counters(
            _keys_df(spark, keys), "user_id", width=WIDTH, depth=DEPTH
        ).collect()
    }
    assert got == dict(py_cms(keys))


def test_cms_estimates_overestimate_and_match_mirror(spark):
    keys = [i % 23 for i in range(300)] + [7] * 40
    grid = py_cms(keys)
    true = Counter(keys)
    query = sorted(true)
    ctr = cms_counters(
        _keys_df(spark, keys), "user_id", width=WIDTH, depth=DEPTH
    )
    got = {
        r["key"]: r["est_cnt"]
        for r in cms_estimate(
            ctr, _keys_df(spark, query), "user_id", width=WIDTH, depth=DEPTH
        ).collect()
    }
    for k in query:
        assert got[k] == py_est(grid, k)
        assert got[k] >= true[k]
    # a never-seen key whose buckets happen to be empty estimates 0;
    # at minimum the estimate exists and is >= 0
    unseen = {
        r["key"]: r["est_cnt"]
        for r in cms_estimate(
            ctr,
            _keys_df(spark, [10_001]),
            "user_id",
            width=WIDTH,
            depth=DEPTH,
        ).collect()
    }
    assert unseen[10_001] == py_est(grid, 10_001)


def test_cms_grids_merge_cellwise(spark):
    """Counters of two disjoint halves sum cell-wise to the counters
    of the union — the distributed/streaming merge contract."""
    from pyspark.sql import functions as F

    keys = [i % 19 for i in range(250)]
    half_a, half_b = keys[:125], keys[125:]
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_counters(
            _keys_df(spark, keys), "user_id", width=WIDTH, depth=DEPTH
        ).collect()
    }
    ga = cms_counters(
        _keys_df(spark, half_a), "user_id", width=WIDTH, depth=DEPTH
    )
    gb = cms_counters(
        _keys_df(spark, half_b), "user_id", width=WIDTH, depth=DEPTH
    )
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in ga.unionByName(gb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .collect()
    }
    assert merged == whole


# ------------------------------------------------------------- HLL

HLL_M = 32


def _w1(m):
    return 60 - (m.bit_length() - 1) + 1


def py_hll_registers(keys, m=HLL_M):
    reg: dict[int, int] = {}
    for k in keys:
        h = _md5i(f"hll:{k}")
        b, q = h % m, h // m
        rho = _w1(m) if q == 0 else _w1(m) - q.bit_length()
        reg[b] = max(reg.get(b, 0), rho)
    return reg


def py_hll_estimate(reg, m=HLL_M):
    import math

    w1 = _w1(m)
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(1 << (w1 - mx) for mx in reg.values()) + (m - len(reg)) * (
        1 << w1
    )
    raw = alpha * m * m * float(2**w1) / s
    empty = m - len(reg)
    if raw < 2.5 * m and empty > 0:
        return round(m * math.log(m / empty), 4)
    return round(raw, 4)


def test_hll_registers_and_estimate_mirror(spark):
    from graphjet_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    keys = [i * 7 + 3 for i in range(500)] + [17] * 40  # dups collapse
    df = _keys_df(spark, keys)
    got_reg = {
        r["bucket"]: r["mx"]
        for r in hll_registers(df, "user_id", m=HLL_M).collect()
    }
    want_reg = py_hll_registers(keys)
    assert got_reg == want_reg
    got_est = hll_estimate(
        hll_registers(df, "user_id", m=HLL_M), m=HLL_M
    ).first()["hll_est"]
    want_est = py_hll_estimate(want_reg)
    assert abs(got_est - want_est) < 1e-4
    # within the ~1.04/sqrt(m) relative error band of the truth (x3)
    true = len(set(keys))
    assert abs(got_est - true) / true < 3 * 1.04 / HLL_M**0.5


def test_hll_small_range_linear_counting(spark):
    from graphjet_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    keys = [1, 2, 3, 4, 5]  # << m: must take the ln(m/V) branch
    est = hll_estimate(
        hll_registers(_keys_df(spark, keys), "user_id", m=HLL_M),
        m=HLL_M,
    ).first()["hll_est"]
    want = py_hll_estimate(py_hll_registers(keys))
    assert abs(est - want) < 1e-4
    assert abs(est - 5) < 2  # linear counting is near-exact here


def test_hll_registers_merge_cellwise_max(spark):
    from pyspark.sql import functions as F

    from graphjet_spark.operators.sketches import hll_registers

    keys = [i * 11 + 1 for i in range(300)]
    half_a, half_b = keys[:150], keys[150:]
    whole = {
        r["bucket"]: r["mx"]
        for r in hll_registers(
            _keys_df(spark, keys), "user_id", m=HLL_M
        ).collect()
    }
    ga = hll_registers(_keys_df(spark, half_a), "user_id", m=HLL_M)
    gb = hll_registers(_keys_df(spark, half_b), "user_id", m=HLL_M)
    merged = {
        r["bucket"]: r["mx"]
        for r in ga.unionByName(gb)
        .groupBy("bucket")
        .agg(F.max("mx").alias("mx"))
        .collect()
    }
    assert merged == whole
