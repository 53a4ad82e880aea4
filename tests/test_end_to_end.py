"""End-to-end: synthesized web corpus -> edge table -> north-rule
algorithms, validating against the corpus's closed-form structure
(SURVEY.md §7 phase 2 — the full pipeline slice)."""

from __future__ import annotations

import numpy as np
import pytest

from graphjet_spark.plans.build_edges import build_edges, simple_graph, vertex_table
from graphjet_spark.plans.components import connected_components
from graphjet_spark.plans.pagerank import pagerank
from graphjet_spark.sources.pages import CorpusSpec, synthesize_pages


@pytest.fixture(scope="module")
def web(spark):
    spec = CorpusSpec(600, n_components=2)
    pdf, true_links = synthesize_pages(spec)
    pages = spark.createDataFrame(pdf).repartition(8)
    edges = build_edges(pages).cache()
    edges.count()
    return pdf, true_links, edges


def test_components_match_corpus_structure(spark, web):
    pdf, _, edges = web
    verts = {r["id"]: r["url"] for r in vertex_table(edges).collect()}
    comp = {
        r["id"]: r["component"]
        for r in connected_components(spark, simple_graph(edges)).collect()
    }
    # every vertex's component agrees with its url's component prefix
    by_prefix = {}
    for vid, c in comp.items():
        prefix = verts[vid].split("//c")[1][0]  # '0' or '1'
        by_prefix.setdefault(prefix, set()).add(c)
    # the corpus guarantees links never cross component boundaries, so
    # the two url families must map to disjoint component-label sets
    assert by_prefix["0"] & by_prefix["1"] == set()


def test_pagerank_hub_dominates(spark, web):
    pdf, true_links, edges = web
    pr = pagerank(spark, simple_graph(edges), tol=1e-8)
    top = pr.orderBy(pr.pagerank.desc()).first()
    verts = {r["id"]: r["url"] for r in vertex_table(edges).collect()}
    # the mega-hub (page 0) receives ~10% of all links -> top PageRank
    assert verts[top["id"]] == pdf["url"].iloc[0]
    # mass conservation across the whole web graph
    total = pr.groupBy().sum("pagerank").first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_matches_numpy_on_web_graph(spark, web):
    _, true_links, edges = web
    pairs = sorted(
        set(
            zip(
                np.asarray(true_links["src_url"]),
                np.asarray(true_links["dst_url"]),
            )
        )
    )
    from .test_micro_graphs import numpy_pagerank

    want = numpy_pagerank(pairs)
    verts = {r["url"]: r["id"] for r in vertex_table(edges).collect()}
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(spark, simple_graph(edges), tol=1e-8).collect()
    }
    assert len(got) == len(want)
    for url, rank in want.items():
        assert got[verts[url]] == pytest.approx(rank, abs=1e-6)
