"""Serving-throughput benchmark — the reference's second headline.

GraphJet serves "up to 500 recommendation requests/s" from one server,
steady-state, concurrent with ingestion (BASELINE.md).  The engine's
commensurable surface is :class:`graphjet_spark.serve.QueryServer` with
``materialize=True``: the first hit per query computes and pins the
result engine-resident (the GraphTables pattern applied to the READ
path); subsequent hits serve driver-memory slices as JSON.  This job
measures that steady state::

    python jobs/serve_bench.py [sf_dir] [seconds] [threads]

Method: start the server over the gate graph, warm the five
recommendation-shaped queries (GraphJet's serving mix — second-degree
recs, SALSA, social proof, metadata recs, trending), then fire
concurrent GETs (limit=20 rows per response, round-robin over the mix)
from ``threads`` client threads for ``seconds`` and report sustained
requests/s.  Every response is a fully-rendered JSON recommendation
list, so one request == one served recommendation set, the same unit
as the reference's number.  Prints one JSON line and appends nothing
(BENCH/BASELINE.md cites the run by hand).
"""

from __future__ import annotations

import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from graphjet_spark.serve import QueryServer  # noqa: E402
from graphjet_spark.session import get_spark  # noqa: E402

SERVING_MIX = [
    "top_second_degree_by_count",
    "salsa_subgraph_det",
    "social_proof",
    "metadata_recs_ptype",
    "trending_nodes",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("serve_bench")
    import __spark_entry__ as entry_mod

    registry = {
        k: v for k, v in entry_mod.queries().items() if k in SERVING_MIX
    }
    srv = QueryServer(
        spark, sf_dir, registry=registry, materialize=True
    ).start()
    base = f"http://127.0.0.1:{srv.port}"

    # ---- warm: first hit per query computes + pins the result -------
    warm_t0 = time.time()
    for name in SERVING_MIX:
        with urllib.request.urlopen(f"{base}/query/{name}?limit=20") as r:
            payload = json.load(r)
            assert payload["n"] >= 0 and "materialized_at" in payload
    warm_s = time.time() - warm_t0

    # ---- steady state: concurrent round-robin GETs ------------------
    stop_at = time.time() + seconds
    counts = [0] * threads
    errs = [0] * threads

    def client(i: int) -> None:
        j = i  # stagger the round-robin start per thread
        while time.time() < stop_at:
            name = SERVING_MIX[j % len(SERVING_MIX)]
            j += 1
            try:
                with urllib.request.urlopen(
                    f"{base}/query/{name}?limit=20", timeout=10
                ) as r:
                    if json.load(r)["n"] >= 0:
                        counts[i] += 1
            except Exception:
                errs[i] += 1

    ts = [threading.Thread(target=client, args=(i,)) for i in range(threads)]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    elapsed = time.time() - t0
    total = sum(counts)
    srv.stop()
    print(
        json.dumps(
            {
                "metric": "serving_requests_per_sec",
                "value": round(total / elapsed, 1),
                "unit": "req/s",
                "requests": total,
                "errors": sum(errs),
                "seconds": round(elapsed, 1),
                "threads": threads,
                "warm_s": round(warm_s, 1),
                "mix": SERVING_MIX,
                "sf_dir": sf_dir,
                "rows_per_response": 20,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
