"""REST read-surface tests (S6 analogue): the stdlib JSON server
exposes the driver-contract query registry over HTTP."""

from __future__ import annotations

import json
import urllib.request

from graphjet_spark.serve import QueryServer

SF = "/root/testdata/sf0.001"


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, json.loads(r.read())


def test_query_server_round_trip(spark):
    srv = QueryServer(spark, SF).start()
    try:
        status, listing = _get(srv.port, "/queries")
        assert status == 200
        assert "degrees" in listing["queries"]
        assert "top_parts_by_engagement" in listing["queries"]

        status, got = _get(srv.port, "/query/top_parts_by_engagement?limit=5")
        assert status == 200 and got["n"] == 5
        # JSON rows mirror the engine result exactly
        import __spark_entry__ as entry_mod

        want = (
            entry_mod.queries()["top_parts_by_engagement"](spark, SF)
            .limit(5)
            .collect()
        )
        assert got["rows"] == [
            {"id": r["id"], "degree": r["degree"]} for r in want
        ]

        status, deg = _get(srv.port, "/query/degrees?limit=3")
        assert status == 200 and deg["n"] == 3
        assert set(deg["rows"][0]) == {"id", "out_degree", "in_degree"}

        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/query/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_query_server_materialized_read_path(spark):
    """materialize=True: the first hit executes the plan once; repeated
    hits serve engine-resident rows sub-second with staleness metadata,
    values unchanged; ?fresh=1 rebuilds."""
    import time

    srv = QueryServer(spark, SF, materialize=True).start()
    try:
        t0 = time.time()
        status, first = _get(srv.port, "/query/degrees?limit=3")
        cold = time.time() - t0
        assert status == 200 and first["n"] == 3
        assert "materialized_at" in first and first["age_s"] >= 0

        t0 = time.time()
        status, again = _get(srv.port, "/query/degrees?limit=3")
        warm = time.time() - t0
        assert again["rows"] == first["rows"]
        assert again["materialized_at"] == first["materialized_at"]
        assert warm < 1.0 and warm < cold  # served from memory

        status, fresh = _get(srv.port, "/query/degrees?limit=3&fresh=1")
        assert fresh["rows"] == first["rows"]  # deterministic rebuild
        assert fresh["materialized_at"] >= first["materialized_at"]
    finally:
        srv.stop()
