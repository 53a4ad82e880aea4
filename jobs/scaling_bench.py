"""Two-cluster-size scaling evidence (BASELINE.json north rule).

Runs jobs/pagerank_job.py at local[8] and local[32] on the SAME
deterministic input (the sandbox stand-in for N vs 4N executors, per
the driver instruction), computes throughput at both plus scaling
efficiency, and writes BENCH/BASELINE.md.

    python jobs/scaling_bench.py [--edges 16000000] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, edges: int, iters: int, vertices: int) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "pagerank_job.py"),
        "--cores", str(cores),
        "--edges", str(edges),
        "--iters", str(iters),
        "--vertices", str(vertices),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=16_000_000)
    ap.add_argument("--vertices", type=int, default=2_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    args = ap.parse_args()

    r_small = run(args.small, args.edges, args.iters, args.vertices)
    r_large = run(args.large, args.edges, args.iters, args.vertices)
    assert r_small["check_top5"] == r_large["check_top5"], "results differ!"

    ratio = args.large / args.small
    speedup = r_small["total_sec"] / r_large["total_sec"]
    efficiency = speedup / ratio
    summary = {
        "metric": "pagerank_scaling_efficiency",
        "small": r_small,
        "large": r_large,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — PageRank scaling evidence

North rule: superstep throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox stand-in (per driver instruction): the same job at
two parallelism levels, `local[{args.small}]` vs `local[{args.large}]`,
on the same deterministic input.

Input: JVM-synthesized power-law directed graph, {r_small["n_edges"]:,} edges /
{args.vertices:,} vertices, mega-hub fixture, {args.iters} PageRank supersteps
(jobs/pagerank_job.py; deterministic — both runs produced identical
top-5 ranks: {r_small["check_top5"]}).

| parallelism | total sec | sec/superstep | edges/sec/superstep |
|---|---|---|---|
| local[{args.small}] | {r_small["total_sec"]} | {r_small["superstep_sec"]} | {r_small["edges_per_sec_per_superstep"]:,.0f} |
| local[{args.large}] | {r_large["total_sec"]} | {r_large["superstep_sec"]} | {r_large["edges_per_sec_per_superstep"]:,.0f} |

**Speedup {args.small}->{args.large} cores: {speedup:.2f}x
(ideal {ratio:.0f}x) -> scaling efficiency {efficiency:.2f}**
(target >= 0.8).

Reproduce: `python jobs/scaling_bench.py --edges {args.edges} --iters {args.iters}`.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
