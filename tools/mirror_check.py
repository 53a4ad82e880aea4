"""At-scale value verification for the north-rule fixpoint algorithms.

The driver gate's DuckDB twins for PageRank / connected components are
deliberately-naive UNROLLED iteration chains — linear per round but
intractable inside a per-query oracle budget at sf10 (measured: the
10-iteration PageRank twin alone exceeds 600s on 195M edges).  The
north star still demands value evidence at 100x, so this tool checks
the engine against an INDEPENDENT mirror with no shared code path:

- edges are loaded and deduped by **DuckDB** (same GRAPH_EDGES_SQL the
  oracles use), never by Spark, so even the input assembly is
  cross-checked;
- PageRank is recomputed in numpy: per-iteration dangling mass +
  ``np.bincount(dst, weights=rank[src]/outdeg[src])`` — the literal
  textbook superstep (same semantics as plans/pagerank.py:196-256:
  init 1/n, new = (1-d)/n + d*dm/n + d*contrib);
- connected components are recomputed with a segmented-min label
  flood (sort edges once per direction, ``np.minimum.reduceat`` per
  round, pointer-jump compression) until fixpoint — exact, no float;
- label propagation is recomputed with per-round lexsorted run counts
  over the distinct symmetrized adjacency (max neighbor-label count,
  ties to the smaller label — plans/labelprop.py:62-73's
  max(struct(cnt, -lbl)) exactly; compacted indices are
  order-isomorphic to the original ids, so tie-breaks agree).

Usage::

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_SHUFFLE=160 python tools/mirror_check.py testdata/sf10 \
        pagerank cc

Prints one line per check: ``pagerank: MATCH max|diff|=... (n=...)``
(PASS bar: max abs diff < 1e-12, far inside the north star's 1e-6) or
``cc: MATCH labels equal (n=...)``; any MISMATCH line is a FAIL.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")

from graphjet_spark.sources.testdata import (  # noqa: E402
    GRAPH_EDGES_SQL,
    TABLES,
)

PR_TOL = 1e-12


def _load_edges_duckdb(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    con = duckdb.connect()
    con.sql("SET memory_limit='24GB'")
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(
        f"SELECT DISTINCT src, dst FROM ({GRAPH_EDGES_SQL})"
    ).fetchnumpy()
    con.close()
    return np.asarray(df["src"], np.int64), np.asarray(df["dst"], np.int64)


def _compact(src, dst):
    uids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    return uids, inv[: len(src)], inv[len(src) :]


def mirror_pagerank(uids, srci, dsti, iters: int, damping: float = 0.85):
    n = len(uids)
    outdeg = np.bincount(srci, minlength=n).astype(np.float64)
    dangling = outdeg == 0.0
    safe_deg = np.where(dangling, 1.0, outdeg)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = rank[dangling].sum()
        contrib = np.bincount(
            dsti, weights=rank[srci] / safe_deg[srci], minlength=n
        )
        rank = (1.0 - damping) / n + damping * dm / n + damping * contrib
    return rank


def mirror_cc(uids, srci, dsti):
    """Exact min-reachable-id labels: per-round segmented min over both
    edge directions + pointer-jump compression, to fixpoint."""
    n = len(uids)
    lbl = np.arange(n, dtype=np.int64)  # label = index of min id

    def _seg(keys):
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        return order, sk[starts], starts

    o_f, k_f, s_f = _seg(dsti)  # incoming per dst
    o_b, k_b, s_b = _seg(srci)  # incoming per src (reverse direction)
    while True:
        prev = lbl
        lbl = lbl.copy()
        m = np.minimum.reduceat(lbl[srci[o_f]], s_f)
        np.minimum.at(lbl, k_f, m)  # one write per distinct key
        m = np.minimum.reduceat(lbl[dsti[o_b]], s_b)
        np.minimum.at(lbl, k_b, m)
        # pointer jumping: adopt the label's label until stable
        while True:
            nxt = lbl[lbl]
            if np.array_equal(nxt, lbl):
                break
            lbl = nxt
        if np.array_equal(lbl, prev):
            break
    return uids[lbl]  # back to original-id labels


def mirror_lp(uids, srci, dsti, iters: int):
    """Exact synchronous label propagation over the DISTINCT
    symmetrized adjacency: each round every vertex adopts its
    neighbors' most frequent label, ties to the smaller label."""
    n = len(uids)
    a = np.concatenate([srci, dsti]).astype(np.int64)
    b = np.concatenate([dsti, srci]).astype(np.int64)
    keep = a != b
    key = np.unique(a[keep] * n + b[keep])  # distinct, sorted by (a,b)
    a2, b2 = key // n, key % n
    del key
    lbl = np.arange(n, dtype=np.int64)  # index labels ~ original ids
    for _ in range(iters):
        nl = lbl[b2]
        order = np.lexsort((nl, a2))
        ka, kl = a2[order], nl[order]
        bound = np.r_[True, (ka[1:] != ka[:-1]) | (kl[1:] != kl[:-1])]
        starts = np.flatnonzero(bound)
        cnt = np.diff(np.r_[starts, len(ka)])
        ra, rl = ka[starts], kl[starts]
        # winner per vertex: max count, tie -> min label
        order2 = np.lexsort((rl, -cnt, ra))
        ra2 = ra[order2]
        first = np.flatnonzero(np.r_[True, ra2[1:] != ra2[:-1]])
        new = lbl.copy()
        new[ra2[first]] = rl[order2][first]
        lbl = new
    return uids[lbl]


def main() -> int:
    sf_dir = sys.argv[1]
    checks = sys.argv[2:] or ["pagerank", "cc"]

    t0 = time.time()
    src, dst = _load_edges_duckdb(sf_dir)
    uids, srci, dsti = _compact(src, dst)
    print(
        f"edges loaded via DuckDB: {len(src)} pairs, {len(uids)} vertices"
        f" [{time.time() - t0:.1f}s]",
        flush=True,
    )

    from graphjet_spark.session import get_spark  # noqa: E402

    spark = get_spark(
        "mirror_check", extra_conf={"spark.driver.maxResultSize": "6g"}
    )
    import __spark_entry__ as entry_mod  # noqa: E402
    from graphjet_spark.plans.components import (  # noqa: E402
        connected_components,
    )
    from graphjet_spark.plans.context import GraphTables  # noqa: E402
    from graphjet_spark.plans.pagerank import pagerank  # noqa: E402
    from graphjet_spark.sources import testdata  # noqa: E402

    tables = GraphTables(testdata.graph_edges(spark, sf_dir))
    failures = 0

    if "pagerank" in checks:
        t0 = time.time()
        pr = pagerank(
            spark, tables.pairs, fixed_iters=entry_mod.PR_ITERS
        ).toPandas()
        t1 = time.time()
        want = mirror_pagerank(uids, srci, dsti, entry_mod.PR_ITERS)
        t2 = time.time()
        got = np.full(len(uids), np.nan)
        got[np.searchsorted(uids, pr["id"].to_numpy())] = pr[
            "pagerank"
        ].to_numpy()
        if np.isnan(got).any():
            print("pagerank: MISMATCH vertex sets differ", flush=True)
            failures += 1
        else:
            d = float(np.abs(got - want).max())
            ok = d < PR_TOL
            print(
                f"pagerank: {'MATCH' if ok else 'MISMATCH'} max|diff|={d:.3e}"
                f" (n={len(uids)}, tol={PR_TOL:g}, north-star 1e-6)"
                f" [spark {t1 - t0:.1f}s, numpy {t2 - t1:.1f}s]",
                flush=True,
            )
            failures += 0 if ok else 1

    if "lp" in checks:
        from graphjet_spark.plans.labelprop import (  # noqa: E402
            label_propagation,
        )

        t0 = time.time()
        lp = label_propagation(
            spark, tables.pairs, iters=entry_mod.LP_ITERS
        ).toPandas()
        t1 = time.time()
        want = mirror_lp(uids, srci, dsti, entry_mod.LP_ITERS)
        t2 = time.time()
        got = np.full(len(uids), -1, dtype=np.int64)
        got[np.searchsorted(uids, lp["id"].to_numpy())] = lp[
            "label"
        ].to_numpy()
        bad = int((got != want).sum())
        ok = bad == 0
        print(
            f"lp: {'MATCH labels equal' if ok else f'MISMATCH {bad} labels'}"
            f" (n={len(uids)}, iters={entry_mod.LP_ITERS},"
            f" distinct_labels={len(np.unique(want))})"
            f" [spark {t1 - t0:.1f}s, numpy {t2 - t1:.1f}s]",
            flush=True,
        )
        failures += 0 if ok else 1

    if "cc" in checks:
        t0 = time.time()
        cc = connected_components(spark, tables.pairs).toPandas()
        t1 = time.time()
        want = mirror_cc(uids, srci, dsti)
        t2 = time.time()
        got = np.full(len(uids), -1, dtype=np.int64)
        got[np.searchsorted(uids, cc["id"].to_numpy())] = cc[
            "component"
        ].to_numpy()
        bad = int((got != want).sum())
        ok = bad == 0
        print(
            f"cc: {'MATCH labels equal' if ok else f'MISMATCH {bad} labels'}"
            f" (n={len(uids)}, components={len(np.unique(want))})"
            f" [spark {t1 - t0:.1f}s, numpy {t2 - t1:.1f}s]",
            flush=True,
        )
        failures += 0 if ok else 1

    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
