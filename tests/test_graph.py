"""PageRank tests: hand-computed fixed-point values on tiny graphs and
the regular-graph invariant."""

from __future__ import annotations

from hadoop_1_spark.operators import graph
from tests.conftest import assert_query_matches_oracle


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


def test_iters_zero_returns_uniform_start(spark):
    """iters=0 is the uniform initial state, not one damped update
    (round-6 advice: the fused final select used to always apply one)."""
    pairs = [("c", x) for x in "lmn"] + [(x, "c") for x in "lmn"]
    out = {r["node"]: r["rank_fp"] for r in graph.pagerank(_edges(spark, pairs), iters=0).collect()}
    assert out == {n: graph.SCALE for n in "clmn"}


def test_dangling_star_hand_computed(spark):
    """Directed star c -> l,m,n (leaves are sinks). N=4, base=150000.
    Round 1: dm = 3 * SCALE (the three sinks held SCALE each),
    share = 3000000 // 4 = 750000.
    leaf: 150000 + (85 * (1000000 // 3 + 750000)) // 100 = 1070833
    c:    150000 + (85 * (0 + 750000)) // 100            = 787500"""
    e = _edges(spark, [("c", "l"), ("c", "m"), ("c", "n")])
    out = {r["node"]: r["rank_fp"] for r in graph.pagerank_dangling(e, iters=1).collect()}
    assert out["c"] == 787500
    assert out["l"] == out["m"] == out["n"] == 1070833


def test_dangling_mass_conserved_approximately(spark):
    """With redistribution, total mass stays ~N*SCALE (floor-division
    loss < 1/SCALE per node per hop) instead of leaking through sinks."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
    rows = graph.pagerank_dangling(e, iters=3).collect()
    total = sum(r["rank_fp"] for r in rows)
    assert abs(total - 4 * graph.SCALE) < 4 * 3 * graph.DAMP_DEN


def test_dangling_no_sinks_matches_plain(spark):
    """On a graph where every node has out-edges the correction is a
    no-op: both variants agree exactly."""
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    plain = {r["node"]: r["rank_fp"] for r in graph.pagerank(_edges(spark, pairs), iters=3).collect()}
    dang = {r["node"]: r["rank_fp"] for r in graph.pagerank_dangling(_edges(spark, pairs), iters=3).collect()}
    assert plain == dang


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


def test_triangles_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "graph_triangles")


def test_degree_stats_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "graph_degree_stats")


def test_triangle_stats_hand_graph(spark):
    """K4 plus a pendant edge: 4 triangles, 15 wedges (hand-counted:
    degrees 3,3,3,4,1 -> 3+3+3+6+0)."""
    from hadoop_1_spark.operators import graph

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    row = graph.triangle_stats(df).collect()[0]
    assert (row.nodes, row.edges, row.wedges, row.triangles) == (5, 7, 15, 4)
    assert row.global_clustering == round(12.0 / 15.0, 6)


def test_triangle_stats_triangle_free(spark):
    """Bipartite (star) graph: zero triangles."""
    from hadoop_1_spark.operators import graph

    df = spark.createDataFrame([(1, 10), (2, 10), (3, 10)], "u bigint, v bigint")
    row = graph.triangle_stats(df).collect()[0]
    assert row.triangles == 0 and row.wedges == 3


def test_triangle_stats_wedge_free(spark):
    """A perfect matching (every degree 1) has zero wedges: clustering
    must be NULL, not an ANSI DIVIDE_BY_ZERO crash."""
    df = spark.createDataFrame([(1, 2), (3, 4)], "u bigint, v bigint")
    row = graph.triangle_stats(df).collect()[0]
    assert (row.wedges, row.triangles) == (0, 0)
    assert row.global_clustering is None
