"""Mega-hub skew proof: task-time histograms for the superstep family.

SURVEY layer 5 promises explicit skew handling for mega-hub domains;
the synthetic graph embeds a power-law hub and the small-scale tests
cover the mechanics, but r3 shipped no at-scale evidence that no
straggler partition dominates a superstep.  This job produces it::

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_SHUFFLE=160 python jobs/skew_probe.py testdata/sf10 4

    # TRUE mega-hub at scale (the synthetic tables are near-uniform,
    # top in-degree share ~7e-6 at sf10 — measured): synthesize an
    # edge table where ONE vertex receives ~10% of all edges and a
    # second SENDS ~10%, then audit the superstep task times; the
    # optional salt arg exercises the explicit two-phase aggregation
    # (north-rule mega-hub handling) for A/B:
    python jobs/skew_probe.py synth-hub:64000000:0.1 4 [salt]

Method: build the engine-resident GraphTables over the edge table,
report the hub's degree share (top in/out-degree vertices / total
edges), run ``iters`` PageRank supersteps, then read per-task run
times from the Spark UI REST API (enabled for this session only) and
report, for the top stages by total task time: task count, median /
mean / max task ms, and the straggler ratio max/median.  A skew-free
superstep shows max/median close to 1 even though one vertex holds a
measurable share of all edges.  Prints one JSON line; BENCH/SF10.md
cites the runs.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from graphjet_spark.plans.context import GraphTables  # noqa: E402
from graphjet_spark.plans.pagerank import pagerank  # noqa: E402
from graphjet_spark.session import get_spark  # noqa: E402
from graphjet_spark.sources import testdata  # noqa: E402


def _api(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _synth_hub_edges(spark, n_edges: int, share: float):
    """Deterministic skewed edge table: one vertex (id 1) RECEIVES
    ~share of all edges, another (id 2) SENDS ~share; the rest is a
    hash-scattered background over an 8M-vertex id space.  All JVM
    expressions — no data ever touches the driver."""
    v = 8_000_000
    hub_m = int(n_edges * share)
    bg = spark.range(n_edges - 2 * hub_m).selectExpr(
        f"pmod(xxhash64(id), {v}) + 10 AS src",
        f"pmod(xxhash64(id + 7), {v}) + 10 AS dst",
    )
    hub_in = spark.range(hub_m).selectExpr(
        f"pmod(xxhash64(id + 13), {v}) + 10 AS src", "CAST(1 AS BIGINT) AS dst"
    )
    hub_out = spark.range(hub_m).selectExpr(
        "CAST(2 AS BIGINT) AS src", f"pmod(xxhash64(id + 29), {v}) + 10 AS dst"
    )
    return bg.union(hub_in).union(hub_out).filter("src <> dst")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = get_spark(
        "skew_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"

    if sf_dir.startswith("synth-hub:"):
        _, m, share = sf_dir.split(":")
        edges = _synth_hub_edges(spark, int(m), float(share))
    else:
        edges = testdata.graph_edges(spark, sf_dir)
    tables = GraphTables(edges)
    n_edges = tables.pairs.count()
    hub = (
        tables.in_deg.orderBy(F.desc("right_degree")).limit(3).collect()
    )
    hub_out = (
        tables.out_deg.orderBy(F.desc("left_degree")).limit(3).collect()
    )
    hub_share = [
        {
            "dst": r["dst"],
            "in_degree": r["right_degree"],
            "share": round(r["right_degree"] / n_edges, 6),
        }
        for r in hub
    ] + [
        {
            "src": r["src"],
            "out_degree": r["left_degree"],
            "share": round(r["left_degree"] / n_edges, 6),
        }
        for r in hub_out
    ]

    t0 = time.time()
    pr = pagerank(spark, tables.pairs, fixed_iters=iters, skew_salt=salt)
    n_vertices = pr.count()
    wall = time.time() - t0

    app = _api(f"{ui}/api/v1/applications")[0]["id"]
    stages = _api(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    )
    # top stages by total executor run time — the superstep joins/aggs
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    audit = []
    for s in stages[:8]:
        sid, att = s["stageId"], s["attemptId"]
        tasks = _api(
            f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/taskList"
            f"?length=5000"
        )
        times = sorted(
            t.get("taskMetrics", {}).get("executorRunTime", 0)
            for t in tasks
            if t.get("taskMetrics")
        )
        if not times:
            continue
        n = len(times)
        med = times[n // 2]
        audit.append(
            {
                "stage": sid,
                "name": s.get("name", "")[:60],
                "n_tasks": n,
                "median_ms": med,
                "mean_ms": round(sum(times) / n, 1),
                "max_ms": times[-1],
                "max_over_median": round(times[-1] / max(med, 1), 2),
            }
        )
    print(
        json.dumps(
            {
                "metric": "superstep_skew_audit",
                "sf_dir": sf_dir,
                "n_edges": n_edges,
                "n_vertices": n_vertices,
                "pagerank_iters": iters,
                "skew_salt": salt,
                "wall_s": round(wall, 1),
                "edges_per_sec_per_superstep": int(n_edges * iters / wall),
                "hub_top_degrees": hub_share,
                "stages": audit,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
