"""SNAP-style edge-list connector: round-trip fidelity, comment/blank
handling, whitespace mode, weighted triples, malformed-line contract."""

from __future__ import annotations

import os

import pytest

from graphjet_spark.sources.edgelist import read_edgelist, write_edgelist

from .conftest import edges_df

PAIRS = [(1, 2), (1, 3), (2, 3), (3, 1), (5, 5), (9223372036854775806, 7)]


def _edge_set(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_roundtrip_exact_edge_set(spark, tmp_path):
    edges = edges_df(spark, PAIRS)
    dest = str(tmp_path / "el")
    write_edgelist(edges, dest)
    back = read_edgelist(spark, dest)
    assert _edge_set(back) == set(PAIRS)
    assert [f.name for f in back.schema.fields] == ["src", "dst"]
    assert all(f.dataType.simpleString() == "bigint" for f in back.schema.fields)


def test_weighted_roundtrip(spark, tmp_path):
    rows = [(1, 2, 0.5), (2, 3, 1.25), (3, 1, -4.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    dest = str(tmp_path / "elw")
    write_edgelist(edges, dest, weighted=True)
    back = read_edgelist(spark, dest, weighted=True)
    assert {(r["src"], r["dst"], r["weight"]) for r in back.collect()} == set(rows)


def _write_snap_file(dirpath, text):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "part-0.txt"), "w") as f:
        f.write(text)


SNAP_TEXT = (
    "# Directed graph (each unordered pair of nodes is saved once)\n"
    "# Nodes: 4 Edges: 3\n"
    "# FromNodeId\tToNodeId\n"
    "1\t2\n"
    "\n"
    "2\t3\n"
    "3\t1\n"
)


def test_snap_header_comments_skipped(spark, tmp_path):
    d = str(tmp_path / "snap")
    _write_snap_file(d, SNAP_TEXT)
    back = read_edgelist(spark, d)
    assert _edge_set(back) == {(1, 2), (2, 3), (3, 1)}


def test_whitespace_mode(spark, tmp_path):
    d = str(tmp_path / "ws")
    _write_snap_file(d, "# c\n1 2\n  2\t 3 \n3     1\n")
    back = read_edgelist(spark, d, sep=None)
    assert _edge_set(back) == {(1, 2), (2, 3), (3, 1)}


def test_malformed_drop_and_fail(spark, tmp_path):
    d = str(tmp_path / "bad")
    _write_snap_file(d, "1\t2\nnot\tanedge\n3\n4\t5\n")
    back = read_edgelist(spark, d, on_malformed="drop")
    assert _edge_set(back) == {(1, 2), (4, 5)}
    with pytest.raises(Exception):
        read_edgelist(spark, d, on_malformed="fail").collect()
    d2 = str(tmp_path / "bad_ws")
    _write_snap_file(d2, "1 2\n3 4 5 6\n7 8\n")
    assert _edge_set(read_edgelist(spark, d2, sep=None)) == {(1, 2), (7, 8)}
    with pytest.raises(ValueError):
        read_edgelist(spark, d2, sep=None, on_malformed="fail")


def test_writer_is_partition_parallel(spark, tmp_path):
    edges = edges_df(spark, PAIRS).repartition(3)
    dest = str(tmp_path / "par")
    write_edgelist(edges, dest)
    parts = [p for p in os.listdir(dest) if p.startswith("part-")]
    assert len(parts) == 3
    assert _edge_set(read_edgelist(spark, dest)) == set(PAIRS)


def test_gzip_edgelist_read(spark, tmp_path):
    """SNAP dumps ship as .txt.gz; the CSV scan reads them transparently."""
    import gzip

    d = str(tmp_path / "gz")
    os.makedirs(d, exist_ok=True)
    with gzip.open(os.path.join(d, "edges.txt.gz"), "wt") as f:
        f.write("# header\n1\t2\n3\t4\n")
    assert _edge_set(read_edgelist(spark, d)) == {(1, 2), (3, 4)}
