"""Triangle count / reciprocity / assortativity on hand-built host
graphs — plus duplicate-direction and self-loop hygiene."""

import math

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.linkgraph import (
    degree_assortativity,
    edge_reciprocity,
    triangle_stats,
    undirected_host_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d, 1) for s, d in pairs],
        ["src_host", "dst_host", "n_links"],
    )


def test_undirected_host_edges_canonicalizes(spark):
    # both directions + a self-loop collapse to one canonical edge
    e = _edges(spark, [("b", "a"), ("a", "b"), ("a", "a")])
    got = undirected_host_edges(e).collect()
    assert [(r["u"], r["v"]) for r in got] == [("a", "b")]


def test_triangle_stats_triangle_plus_pendant(spark):
    # triangle a-b-c plus pendant edge c-d; directions arbitrary
    e = _edges(
        spark,
        [("a", "b"), ("c", "b"), ("a", "c"), ("c", "d")],
    )
    got = triangle_stats(e).collect()[0]
    assert got["n_nodes"] == 4 and got["n_edges"] == 4
    # degrees a2 b2 c3 d1 -> wedges = 1 + 1 + 3 + 0 = 5
    assert got["n_wedges"] == 5
    assert got["n_triangles"] == 1
    assert got["transitivity"] == pytest.approx(0.6)


def test_triangle_stats_counts_each_triangle_once(spark):
    # K4: 4 triangles, 12 wedges, transitivity 1.0
    nodes = ["a", "b", "c", "d"]
    pairs = [(u, v) for i, u in enumerate(nodes)
             for v in nodes[i + 1:]]
    got = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert got["n_triangles"] == 4
    assert got["transitivity"] == pytest.approx(1.0)


def test_edge_reciprocity_hand_values(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("x", "x")],
    )
    got = edge_reciprocity(e).collect()[0]
    assert got["n_edges"] == 3          # self-loop excluded
    assert got["n_reciprocal"] == 2
    assert got["reciprocity"] == pytest.approx(round(2 / 3, 6))


def test_degree_assortativity_matches_python_twin(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = degree_assortativity(_edges(spark, pairs)).collect()[0]
    deg = {"a": 2, "b": 2, "c": 3, "d": 1}
    xs, ys = [], []
    for u, v in pairs:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    sj, sk = sum(xs), sum(ys)
    sjk = sum(a * b for a, b in zip(xs, ys))
    sjj = sum(a * a for a in xs)
    skk = sum(b * b for b in ys)
    num = n * sjk - sj * sk
    den = math.sqrt((n * sjj - sj * sj) * (n * skk - sk * sk))
    assert got["assortativity"] == pytest.approx(
        round(num / den, 6), abs=1e-9
    )
    assert got["n_nodes"] == 4 and got["n_edges"] == 4


def test_degree_assortativity_regular_graph_is_null(spark):
    # a 4-cycle is 2-regular: zero degree variance -> NULL r
    got = degree_assortativity(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    ).collect()[0]
    assert got["assortativity"] is None
