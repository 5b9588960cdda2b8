"""operators.graph pagerank: hand-replayable fixed-point ranks,
dangling mass, damping validation, empty graph."""

from __future__ import annotations

from collections import defaultdict

import pytest

from go_jsonschema_spark.operators.graph import pagerank


def _pr_py(edges, iters=3, num=17, den=20, init=10**12):
    e = sorted(set(edges))
    nodes = sorted({u for u, v in e} | {v for u, v in e})
    out: dict = defaultdict(int)
    for u, v in e:
        out[u] += 1
    rank = {n: init for n in nodes}
    n_nodes = len(nodes)
    tel = init * (den - num) // den
    for _ in range(iters):
        inm: dict = defaultdict(int)
        for u, v in e:
            inm[v] += (rank[u] * num) // (den * out[u])
        dang = sum(rank[n] for n in nodes if out[n] == 0)
        dsh = ((dang // n_nodes) * num) // den
        rank = {n: tel + inm[n] + dsh for n in nodes}
    return rank


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_pagerank_matches_python_replay(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges_df(spark, edges)).collect()}
    assert got == _pr_py(edges)  # EXACT integer equality


def test_pagerank_dangling_and_parallel_edges(spark):
    # b is dangling; the duplicated a->b edge must collapse
    edges = [("a", "b"), ("a", "b"), ("c", "b")]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges_df(spark, edges), iterations=2).collect()}
    assert got == _pr_py([("a", "b"), ("c", "b")], iters=2)
    # dangling + teleport only for sources; sink accumulates most mass
    assert got["b"] > got["a"] == got["c"]


def test_pagerank_more_inlinks_more_rank(spark):
    edges = [("u1", "hub"), ("u2", "hub"), ("u3", "hub"), ("u1", "leaf")]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges_df(spark, edges)).collect()}
    assert got["hub"] > got["leaf"]
    assert got == _pr_py(edges)


def test_pagerank_null_edges_dropped_and_empty(spark):
    edges = _edges_df(spark, [("a", None), (None, "b")])
    assert pagerank(edges).collect() == []


def test_pagerank_validation(spark):
    df = _edges_df(spark, [("a", "b")])
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=(20, 17))
