"""Graph-analytics queries: PageRank over the part↔supplier
co-occurrence graph derived from lineitem.

Companion family to the near-dup cluster resolution in q_dedup
(connected components); see operators/graph.py for the integer
fixed-point determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import graph
from hadoop_1_spark.registry import _load, register

PR_ITERS = 3
PR_TOP = 25

_EDGES_SQL = """
  SELECT 'p:' || CAST(l_partkey AS VARCHAR) AS src,
         's:' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL)
  UNION ALL
  SELECT 's:' || CAST(l_suppkey AS VARCHAR) AS src,
         'p:' || CAST(l_partkey AS VARCHAR) AS dst
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL)
"""


@register(
    "graph_pagerank",
    oracle=graph.pagerank_oracle_sql(_EDGES_SQL, iters=PR_ITERS, top=PR_TOP),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 nodes by 3-round damped PageRank over the undirected
    part↔supplier bipartite graph (distinct lineitem co-occurrence
    pairs, both directions). Exact integer fixed-point; the top-25 cut
    is fully tie-broken (rank desc, node asc) so the LIMIT boundary is
    deterministic."""
    li = _load(spark, sf_dir, "lineitem")
    edges = graph.bipartite_edges(li, "l_partkey", "l_suppkey")
    pr = graph.pagerank(edges, iters=PR_ITERS)
    return pr.orderBy(F.desc("rank_fp"), F.asc("node")).limit(PR_TOP)
