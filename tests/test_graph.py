"""PageRank tests: hand-computed fixed-point values on tiny graphs and
the regular-graph invariant."""

from __future__ import annotations

from hadoop_1_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_symmetric_pair_is_fixpoint(spark):
    """A 2-cycle is 1-regular: uniform rank SCALE is exactly preserved
    (150000 + 85% of a full SCALE contribution = SCALE)."""
    e = _edges(spark, [("a", "b"), ("b", "a")])
    out = {r["node"]: r["rank_fp"] for r in graph.pagerank(e, iters=3).collect()}
    assert out == {"a": graph.SCALE, "b": graph.SCALE}


def test_star_graph_hand_computed(spark):
    """Center + 3 leaves, undirected. Round 1 from uniform SCALE:
    center: 150000 + (85 * 3*1000000) // 100            = 2700000
    leaf:   150000 + (85 * (1000000 // 3)) // 100       = 433333"""
    pairs = [("c", x) for x in "lmn"] + [(x, "c") for x in "lmn"]
    e = _edges(spark, pairs)
    out = {r["node"]: r["rank_fp"] for r in graph.pagerank(e, iters=1).collect()}
    assert out["c"] == 2700000
    assert out["l"] == out["m"] == out["n"] == 433333


def test_outdeg_reported(spark):
    pairs = [("c", x) for x in "lmn"] + [(x, "c") for x in "lmn"]
    out = {r["node"]: r["outdeg"] for r in graph.pagerank(_edges(spark, pairs)).collect()}
    assert out == {"c": 3, "l": 1, "m": 1, "n": 1}


def test_bipartite_edges_shape(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10), (2, None)], "a long, b long"
    )
    rows = {(r["src"], r["dst"]) for r in graph.bipartite_edges(df, "a", "b").collect()}
    assert rows == {
        ("p:1", "s:10"), ("s:10", "p:1"),
        ("p:2", "s:10"), ("s:10", "p:2"),
    }


def test_ranks_bounded_below_by_base(spark):
    """Every node keeps at least the teleport mass."""
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    out = graph.pagerank(_edges(spark, pairs), iters=3).collect()
    base = ((graph.DAMP_DEN - graph.DAMP_NUM) * graph.SCALE) // graph.DAMP_DEN
    assert all(r["rank_fp"] >= base for r in out)
