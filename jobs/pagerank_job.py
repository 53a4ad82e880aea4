"""Standalone PageRank job for the two-cluster-size scaling evidence.

Run via spark-submit (or plain python) at two parallelism levels on the
SAME deterministic input:

    python jobs/pagerank_job.py --cores 8  --edges 16000000 --iters 8
    python jobs/pagerank_job.py --cores 32 --edges 16000000 --iters 8

Prints ONE JSON line: {cores, n_edges, iters, superstep_sec,
edges_per_sec_per_superstep, total_sec}.

The input is synthesized JVM-side (deterministic xxhash64 arithmetic, no
driver materialization): a power-law out-degree directed graph with a
mega-hub — the same structural fixtures as the page corpus, at a size
where compute dominates scheduler overhead (the regime that models a
real multi-executor cluster; per BASELINE.md the local[8] vs local[32]
pair stands in for N vs 4N executors).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_edges(spark, n_vertices: int, n_edges: int):
    """Deterministic power-law-ish edge table, fully JVM-side.

    Each vertex draws deg ~ 1 + (h % 64)^2 / 128 (skewed), capped so the
    total lands near n_edges; vertex 0 additionally receives ~5% of all
    edges (mega-hub fixture).
    """
    from pyspark.sql import functions as F

    avg = max(1, n_edges // n_vertices)
    v = spark.range(n_vertices).select(F.col("id").alias("src"))
    # E[(h % 64)^2] = 1365 -> scale so E[deg] ~= avg (power-law-ish tail)
    deg = (
        F.lit(1)
        + F.pow(F.pmod(F.xxhash64("src"), F.lit(64)), F.lit(2.0))
        * F.lit((avg - 1) / 1365.0)
    ).cast("int")
    edges = (
        v.select("src", F.explode(F.sequence(F.lit(1), deg)).alias("j"))
        .select(
            "src",
            F.when(
                F.pmod(F.xxhash64("src", "j", F.lit(1)), F.lit(20)) == 0, F.lit(0)
            )
            .otherwise(F.pmod(F.xxhash64("src", "j"), F.lit(n_vertices)))
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return edges


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--vertices", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=16_000_000)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    # Partition count is sized to the DATA, identical at every
    # parallelism level (exactly as on a real cluster, where the table's
    # bucketing doesn't change when executors are added) — cores only
    # control concurrency. Tying partitions to cores would give the
    # small run giant spilling partitions and corrupt the comparison.
    partitions = max(32, args.edges // 1_000_000)
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cores)
    os.environ["SPARK_GRAFT_SHUFFLE"] = str(partitions)
    from graphjet_spark.plans.pagerank import pagerank
    from graphjet_spark.session import get_spark

    spark = get_spark(
        f"pagerank_scaling_{args.cores}",
        master=f"local[{args.cores}]",
        extra_conf={
            # partitioning here is explicit and data-sized; AQE
            # coalescing would merge the narrow state stages down to
            # ~64MB/partition and serialize them (measured: +28% wall)
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    edges = synth_edges(spark, args.vertices, args.edges)
    edges = edges.repartition(partitions, "src").persist()
    n_edges = edges.count()  # materialize input outside the timed region

    t0 = time.time()
    pr = pagerank(
        spark, edges, fixed_iters=args.iters, assume_simple=True,
        partitions=partitions,
    )
    top = pr.orderBy("id").limit(5).collect()  # force full evaluation
    total = time.time() - t0
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_edges": n_edges,
                "iters": args.iters,
                "total_sec": round(total, 2),
                "superstep_sec": round(total / args.iters, 3),
                "edges_per_sec_per_superstep": round(n_edges * args.iters / total, 0),
                "check_top5": [round(r["pagerank"], 10) for r in top],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
