"""Iterative graph analytics: PageRank in exact integer fixed-point.

Companion to the near-dup cluster resolver (operators/dedup.py
``connected_components``): where CC propagates min-labels to a fixpoint,
PageRank runs a fixed number of damped link-mass iterations — the other
canonical "iterative join + aggregate" shape a data-curation engine
needs (authority scoring of a link/citation/co-occurrence graph feeds
corpus quality weighting, e.g. the original PageRank use and modern
URL-authority corpus filters).

Determinism contract: floating-point PageRank sums are order-dependent,
so this implementation works in integer fixed-point — ranks are bigints
in units of 1/SCALE, contributions use integer floor division
(``rank div outdeg``; DuckDB ``//``), and the damping update is
``base + (85 * sum) div 100`` — every operation exact and
order-independent, so the DuckDB oracle replays it bit-for-bit with
unrolled CTE rounds. (Floor-division fixed point loses < 1/SCALE per
hop vs real arithmetic — irrelevant for ranking, essential for
cross-engine hashing.)

Scale shape: the edge relation (joined once with out-degrees) is
persisted and re-read every round; each round is one edges⋈ranks join
(ranks is node-sized — broadcast when it fits, co-partitioned hash join
when not) plus one dst-keyed aggregation. Overflow bound: total rank
mass is ~n_nodes * SCALE and the damped sum multiplies by 85 before
dividing, so n_nodes * SCALE * 85 must stay < 2^63 — with SCALE=1e6
that is ~10^11 nodes, far beyond any real graph's node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_1_spark.operators.caching import persist_tracked

SCALE = 1_000_000
DAMP_NUM = 85  # damping factor 0.85 as an exact rational 85/100
DAMP_DEN = 100


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Damped PageRank over a directed edge list (src, dst), ``iters``
    rounds from a uniform start of SCALE per node.

    The node set is taken from the SOURCE side (callers modelling
    undirected graphs supply both edge directions, so every node has
    out-degree ≥ 1 and no dangling-mass correction is needed; a node
    with in-edges only would need the dangling redistribution term this
    fixed-shape variant deliberately omits).

    Returns (node, rank_fp, outdeg): rank in 1/SCALE units."""
    deg = persist_tracked(
        edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    )
    if iters < 1:
        # 0 rounds = the uniform start, not one damped update (round-6
        # advice: the fused final select below always applies one update)
        return deg.select(
            F.col("src").alias("node"),
            F.lit(SCALE).cast("bigint").alias("rank_fp"),
            "outdeg",
        )
    # pre-partition the persisted edge relation by dst ONCE: every
    # iteration's contribution aggregation groups by dst, and the
    # broadcast rank join preserves the edge side's partitioning, so all
    # ``iters`` round aggregations run shuffle-free against the cached
    # partitioning — the per-round shuffle cost is O(nodes), never
    # O(edges)
    ew = persist_tracked(edges.join(deg, "src").repartition(F.col("dst")))
    base = ((DAMP_DEN - DAMP_NUM) * SCALE) // DAMP_DEN  # 0.15 * SCALE exactly
    damped = (
        F.lit(base).cast("bigint")
        + F.expr(f"({DAMP_NUM} * coalesce(s, 0)) div {DAMP_DEN}")
    ).cast("bigint")
    # round 1 starts uniform (rank = SCALE for every node), so the first
    # contribution sum needs no rank join at all; each later round fuses
    # the damping update INTO the edge join — the node-sized contribution
    # relation (keyed by dst = node) is broadcast straight onto the
    # persisted edge relation and the new rank is computed inline, instead
    # of first materializing a ranks relation via a separate deg-join
    # (round-6: one broadcast join + one aggregation per round, down from
    # two joins; the agg stays shuffle-free against ew's dst partitioning)
    contrib = (
        ew.select(F.col("dst"), F.expr(f"{SCALE} div outdeg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    for _ in range(iters - 1):
        prev = contrib.select(F.col("dst").alias("node"), F.col("s"))
        contrib = (
            ew.join(F.broadcast(prev), ew["src"] == prev["node"], "left")
            .select(
                F.col("dst"),
                F.expr(
                    f"(cast({base} as bigint)"
                    f" + ({DAMP_NUM} * coalesce(s, 0)) div {DAMP_DEN})"
                    " div outdeg"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
    return (
        deg.join(F.broadcast(contrib), deg["src"] == contrib["dst"], "left")
        .select(
            F.col("src").alias("node"),
            damped.alias("rank_fp"),
            "outdeg",
        )
    )


def pagerank_dangling(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Damped PageRank with dangling-mass redistribution over a DIRECTED
    edge list (src, dst), ``iters`` rounds from a uniform start of SCALE
    per node (round-6 verdict #7).

    Unlike :func:`pagerank` (node set = sources; callers guarantee
    outdeg ≥ 1), the node set here is src ∪ dst, so sink nodes (in-edges
    only) exist and their rank mass would leak out of the system each
    round. The standard correction redistributes the dangling mass
    uniformly: with dm = Σ rank over outdeg-0 nodes and N = node count,

        rank'(n) = base + (85 * (contrib(n) + dm div N)) div 100

    — all integer fixed-point (floor division), order-independent, so the
    DuckDB oracle (:func:`pagerank_dangling_oracle_sql`) replays it
    bit-for-bit with unrolled CTEs.

    Scale shape: per round, one edges⋈ranks join (ranks is node-sized —
    broadcast) feeding a dst-keyed aggregation, plus the bounded extras
    the correction needs: a one-row dangling-mass aggregate over the
    node-sized ranks relation and a node-sized left join to materialize
    the next ranks relation (the scalar rides along as a broadcast
    crossJoin — never a driver-side collect).

    Returns (node, rank_fp, outdeg): rank in 1/SCALE units."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nd = persist_tracked(
        nodes.join(deg, nodes["node"] == deg["src"], "left")
        .select("node", F.coalesce(F.col("outdeg"), F.lit(0)).cast("bigint").alias("outdeg"))
    )
    ncnt = nd.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    # pre-partition the edge relation by dst once, as in pagerank(): every
    # round's contribution agg groups by dst and the broadcast ranks join
    # preserves the edge side's partitioning
    ew = persist_tracked(edges.select("src", "dst").repartition(F.col("dst")))
    base = ((DAMP_DEN - DAMP_NUM) * SCALE) // DAMP_DEN
    ranks = nd.select("node", "outdeg", F.lit(SCALE).cast("bigint").alias("rank"))
    for i in range(iters):
        contrib = (
            ew.join(F.broadcast(ranks), ew["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        dm = ranks.where(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("bigint").alias("dm")
        )
        ranks = (
            nd.join(F.broadcast(contrib), nd["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dm))
            .crossJoin(F.broadcast(ncnt))
            .select(
                "node",
                "outdeg",
                F.expr(
                    f"cast({base} + ({DAMP_NUM} * (coalesce(s, 0)"
                    f" + dm div n_nodes)) div {DAMP_DEN} as bigint)"
                ).alias("rank"),
            )
        )
        if i < iters - 1:
            # pin the node-sized state each round: without the lineage
            # break every round's plan re-derives all prior rounds (the
            # contribution join AND the dangling aggregate each replay the
            # previous ranks), compounding to ~200 exchanges by round 3
            ranks = persist_tracked(ranks)
    return ranks.select("node", F.col("rank").alias("rank_fp"), "outdeg")


def pagerank_dangling_oracle_sql(
    edges_sql: str, iters: int = 3, top: int | None = None
) -> str:
    """DuckDB replay of :func:`pagerank_dangling`: unrolled integer
    fixed-point rounds with the dangling-mass CTE per round."""
    base = ((DAMP_DEN - DAMP_NUM) * SCALE) // DAMP_DEN
    parts = [
        f"WITH e AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "deg AS (SELECT n.node, CAST(coalesce(d.c, 0) AS BIGINT) AS outdeg"
        " FROM nodes n LEFT JOIN"
        " (SELECT src, count(*) AS c FROM e GROUP BY src) d ON n.node = d.src)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes)",
        f"r0 AS (SELECT node, outdeg, CAST({SCALE} AS BIGINT) AS rank FROM deg)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS node, sum(r.rank // r.outdeg) AS s
  FROM e JOIN r{i - 1} r ON e.src = r.node GROUP BY e.dst
),
dm{i} AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dm
          FROM r{i - 1} WHERE outdeg = 0),
r{i} AS (
  SELECT d.node, d.outdeg,
         CAST({base} + ({DAMP_NUM} * (coalesce(c.s, 0)
              + dm.dm // nn.n_nodes)) // {DAMP_DEN} AS BIGINT) AS rank
  FROM deg d LEFT JOIN c{i} c ON d.node = c.node, dm{i} dm, nn
)"""
        )
    tail = f"""
SELECT node, rank AS rank_fp, outdeg FROM r{iters}"""
    if top is not None:
        tail += f"\nORDER BY rank_fp DESC, node ASC LIMIT {top}"
    return ",\n".join(parts) + tail


def bipartite_edges(
    df: DataFrame, a_col: str, b_col: str, a_tag: str = "p", b_tag: str = "s"
) -> DataFrame:
    """Undirected bipartite edge list from two key columns: distinct
    (a, b) pairs emitted in both directions, nodes namespaced by tag
    ('p:123' / 's:45') so the two key spaces never collide."""
    # persist the distinct pair relation: the union reads it twice, and
    # pagerank's degree/edge-weight branches read the union twice more —
    # without the pin the corpus-sized distinct re-runs 4x (measured
    # 6.5 s -> expected ~3 s at sf0.1)
    pairs = persist_tracked(
        df.select(
            F.concat(F.lit(a_tag + ":"), F.col(a_col).cast("string")).alias("a"),
            F.concat(F.lit(b_tag + ":"), F.col(b_col).cast("string")).alias("b"),
        )
        .where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .distinct()
    )
    return pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def pagerank_oracle_sql(edges_sql: str, iters: int = 3, top: int | None = None) -> str:
    """DuckDB replay: unrolled integer fixed-point rounds over an edge
    CTE (columns src, dst)."""
    base = ((DAMP_DEN - DAMP_NUM) * SCALE) // DAMP_DEN
    parts = [
        f"WITH e AS ({edges_sql})",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT src AS node, CAST({SCALE} AS BIGINT) AS rank FROM deg)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS node, sum(r.rank // d.outdeg) AS s
  FROM e JOIN r{i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT deg.src AS node,
         CAST({base} + ({DAMP_NUM} * coalesce(c{i}.s, 0)) // {DAMP_DEN} AS BIGINT) AS rank
  FROM deg LEFT JOIN c{i} ON deg.src = c{i}.node
)"""
        )
    tail = f"""
SELECT r.node, r.rank AS rank_fp, deg.outdeg
FROM r{iters} r JOIN deg ON r.node = deg.src"""
    if top is not None:
        tail += f"\nORDER BY rank_fp DESC, node ASC LIMIT {top}"
    return ",\n".join(parts) + tail


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str, mod: int | None = None
) -> DataFrame:
    """Undirected edge list (u, v), u < v, of items co-occurring within a
    group — one distinct self-join on the group key (single shuffle; the
    self-join reuses one exchange). ``mod`` keeps only groups with
    ``group % mod == 0``: a deterministic, SQL-replayable group sample
    that bounds edge count linearly at any scale (the knob a 100 TB run
    turns instead of enumerating every group's quadratic pair set)."""
    base = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).where(F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
    if mod is not None:
        base = base.where(F.col("_g") % mod == 0)
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, (F.col("a._g") == F.col("b._g")) & (F.col("a._i") < F.col("b._i")))
        .select(F.col("a._i").alias("u"), F.col("b._i").alias("v"))
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact triangle census of an undirected graph given as distinct
    (u, v), u < v edges: one summary row (nodes, edges, wedges,
    triangles, global_clustering).

    Algorithm (compact-forward / degree orientation, Latapy 2008): each
    edge is oriented from its lower- to its higher-(degree, id) endpoint,
    so every out-neighborhood has size O(sqrt(E)) and the wedge join
    materializes sum(outdeg^2) rows — bounded, unlike the naive
    id-ordered enumeration whose wedge count is dominated by the hottest
    node's full degree. Each triangle has exactly one node with two
    out-edges under a total-order orientation, so the count is exact and
    orientation-free — which is why the oracle can replay it with the
    SIMPLER id-ordered join (a<b<c) and still match: triangle counts are
    invariants of the graph, not the algorithm.

    Shuffles: degree agg, two orientation joins (deg is node-sized -
    broadcast), the wedge self-join on src, and the closing-edge probe
    join on (u, v). The oriented relation is persisted: three branches
    read it (wedge left, wedge right, closing probe).

    global_clustering = 3 * triangles / wedges (round 6): one double
    division, deterministic; wedges = sum deg*(deg-1)/2 exact."""
    e = persist_tracked(edges.select("u", "v"))
    deg = persist_tracked(
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    # orient: src = endpoint with smaller (deg, id); ties impossible since
    # (d, n) is a total order over distinct node ids
    oriented = (
        e.join(F.broadcast(deg.select(F.col("n"), F.col("d").alias("du"))), e["u"] == F.col("n"))
        .drop("n")
        .join(F.broadcast(deg.select(F.col("n"), F.col("d").alias("dv"))), e["v"] == F.col("n"))
        .drop("n")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t"),
                         F.col("du").alias("ds"), F.col("dv").alias("dt")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"),
                         F.col("dv").alias("ds"), F.col("du").alias("dt"))
            )
            .alias("o")
        )
        .select("o.s", "o.t", "o.dt")
    )
    od = persist_tracked(oriented)
    x = od.select(F.col("s"), F.col("t").alias("b"), F.col("dt").alias("db"))
    y = od.select(F.col("s"), F.col("t").alias("c"), F.col("dt").alias("dc"))
    wedges2 = (
        x.join(y, "s")
        .where(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        .select(F.col("b").alias("s"), F.col("c").alias("t"))
    )
    tri = (
        wedges2.join(od.select("s", "t"), ["s", "t"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    # wedge join above enumerates ORIENTED wedges (the triangle probe);
    # the clustering denominator is the classic undirected wedge count
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("nodes"),
        F.expr("cast(sum(d * (d - 1)) div 2 as bigint)").alias("wedges"),
    )
    ecnt = e.agg(F.count(F.lit(1)).cast("bigint").alias("edges"))
    # three one-row aggregates folded with crossJoins — fully lazy, no
    # driver-side actions
    return (
        stats.crossJoin(ecnt)
        .crossJoin(tri)
        .select(
            "nodes",
            "edges",
            "wedges",
            "triangles",
            # wedge-free graphs (max degree 1) have no defined clustering;
            # guard the division — ANSI mode (Spark 4 default) turns 0/0
            # into a DIVIDE_BY_ZERO error, not NaN
            F.when(
                F.col("wedges") > 0,
                F.round(
                    F.lit(3.0) * F.col("triangles").cast("double")
                    / F.col("wedges").cast("double"),
                    6,
                ),
            ).alias("global_clustering"),
        )
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution of an undirected (u, v) edge list: one row
    per distinct degree value (degree, n_nodes) — the O(max-degree)-row
    observability summary (power-law checks, hub detection) computed
    with two key-bounded aggregations."""
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
