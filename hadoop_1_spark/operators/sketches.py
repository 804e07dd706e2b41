"""Frequent-item (heavy hitter) operators: exact answers from two-pass
candidate generation.

The reference's aggregation library reports exact per-key counts
(mapred/lib/aggregate/LongValueSum.java:23) but has no bounded-output
"which keys are frequent" primitive — the closest idiom is running the
full wordcount and post-filtering, which at 100 TB shuffles the entire
long tail to answer a question about the top handful of keys. These
operators answer it with the classic two-pass frequent-items scheme
(Misra–Gries 1982 / the "lossy counting" family): a candidate pass whose
per-partition state is provably a superset of the true heavy hitters,
then an exact recount restricted to candidates.

Correctness invariant (pigeonhole): any item with global count
``> n/(k+1)`` has local count ``> n_p/(k+1)`` in at least one partition
(if it fell at or below that bound in every partition, summing over
partitions bounds its global count by n/(k+1) — contradiction). So a
per-partition candidate rule that keeps every item with local count
``> n_p/(k+1)`` yields a superset of the true heavy hitters, and the
exact recount + exact global threshold makes the FINAL output
deterministic and partitioning-independent even though the candidate
set is not.

Two implementations of the candidate pass, same exact output:

- ``heavy_hitters`` (JVM path): one (partition, item) hash aggregation —
  partial aggregation completes map-side because the partition id is
  constant within a partition — then a broadcast of per-partition totals
  and the threshold filter. ONE tail-sized shuffle (the same cost as
  wordcount), after which everything is candidate-sized or broadcast.
- ``heavy_hitters_mg`` (bounded-memory twin): a true Misra–Gries sketch
  with k counters per partition, run in an Arrow-batched ``mapInPandas``
  over the token stream; the candidate shuffle carries AT MOST k rows
  per partition regardless of vocabulary size. This is the shape for a
  100 TB corpus whose key space is unique-heavy (URLs, n-grams): the
  JVM path's (partition, item) aggregation would shuffle the whole tail,
  the sketch never materializes it. Cost: exactly TWO data passes — the
  sketch pass (Arrow seam, scan-shaped, no shuffle; per-partition totals
  ride along as sentinel rows so no separate count scan) and the exact
  recount of the ≤ k*num_partitions candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_1_spark.operators.caching import persist_tracked


def heavy_hitters(df: DataFrame, col: str, k: int = 30) -> DataFrame:
    """Exact heavy hitters (count > n/(k+1)) via the JVM candidate pass.

    Plan shape: one (pid, item) aggregation (the only tail-sized
    shuffle; map-side partial aggregation finishes locally because pid
    is constant per partition), persisted because three small branches
    read it: per-partition totals (broadcast back), the candidate
    filter, and the exact recount — which reuses the SAME aggregated
    rows (sum of local counts per item is the exact global count), so
    no second corpus scan.

    The total row count ``n`` is likewise derived from the local counts.
    Output: (item, cnt, threshold), exact, partitioning-independent."""
    items = df.select(F.col(col))
    local = persist_tracked(
        items.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = local.groupBy("_pid").agg(F.sum("c").alias("_np"))
    cand = (
        local.join(F.broadcast(totals), "_pid")
        .where(F.col("c") * (k + 1) > F.col("_np"))
        .select(col)
        .distinct()
    )
    # Exact global counts = sum of per-partition counts, restricted to
    # candidate items only (candidate-sized shuffle).
    exact = (
        local.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.sum("c").cast("bigint").alias("cnt"))
    )
    total = local.agg(F.sum("c").alias("_n"))
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * (k + 1) > F.col("_n"))
        .select(
            F.col(col),
            F.col("cnt"),
            F.expr(f"cast(_n as bigint) div {k + 1}").cast("bigint").alias("threshold"),
        )
    )


def heavy_hitters_mg(df: DataFrame, col: str, k: int = 30) -> DataFrame:
    """Exact heavy hitters via a per-partition Misra–Gries sketch.

    The sketch holds at most k counters; on overflow every counter is
    decremented (the MG step), which preserves the guarantee that any
    item with local count > n_p/(k+1) survives. Candidates are the
    union of surviving keys — ≤ k rows per partition cross the shuffle
    no matter how large the vocabulary. The exact recount then scans
    the stream once more with a broadcast semi-join on the candidate
    set, so the only full-data costs are two scans and one Arrow
    crossing; no shuffle ever carries the tail."""
    items = df.select(F.col(col).alias("_item"))

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_p = 0
        for pdf in batches:
            for it in pdf["_item"]:
                if it is None:
                    continue
                n_p += 1
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k:
                    counters[it] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        # candidate rows carry _np=0; ONE sentinel row per partition
        # (null item) carries the partition's total, so the global n
        # falls out of the same single pass — no third corpus scan
        yield pd.DataFrame(
            {
                "_item": list(counters.keys()) + [None],
                "_np": [0] * len(counters) + [n_p],
            }
        )

    summary = persist_tracked(
        items.mapInPandas(mg_partition, schema="_item string, _np long")
    )
    cand = summary.where(F.col("_item").isNotNull()).select("_item").distinct()
    total = summary.agg(F.sum("_np").alias("_n"))
    exact = (
        items.join(F.broadcast(cand), "_item", "left_semi")
        .groupBy("_item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * (k + 1) > F.col("_n"))
        .select(
            F.col("_item").alias(col),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr(f"cast(_n as bigint) div {k + 1}").cast("bigint").alias("threshold"),
        )
    )


def heavy_hitters_oracle_sql(item_sql: str, k: int, out_col: str) -> str:
    """DuckDB replay shared by both variants: the exact definition the
    two-pass schemes compute. ``item_sql`` is a query producing one
    column named ``item``."""
    return f"""
WITH items AS ({item_sql}),
tot AS (SELECT count(*) AS n FROM items)
SELECT item AS {out_col},
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(n // {k + 1} AS BIGINT) AS threshold
FROM items, tot
GROUP BY item, n
HAVING count(*) * {k + 1} > n
"""


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_bucket(col: Column, d: int, width: int) -> Column:
    """Bucket for depth row d: each md5 digest yields TWO independent
    60-bit values (its first/second 15-hex-char halves — the
    textops.hex_hash offset idiom), so a depth-4 sketch costs 2 md5
    evaluations per item, not 4. The md5 is the dominant build cost at
    scan speed; this halves it."""
    digest = F.md5(F.concat(F.lit(f"{d // 2}:"), col.cast("string")))
    offset = 1 if d % 2 == 0 else 16
    return (
        F.conv(F.substring(digest, offset, 15), 16, 10).cast("long") % width
    ).cast("int").alias("bucket")


def cms_bucket_sql(item_expr: str, d: int, width: int) -> str:
    """DuckDB twin of _cms_bucket for oracle generators."""
    offset = 1 if d % 2 == 0 else 16
    return (
        f"CAST(('0x' || substr(md5('{d // 2}:' || CAST({item_expr} AS VARCHAR)), "
        f"{offset}, 15))::BIGINT % {width} AS INT)"
    )


def cms_build(items: DataFrame, col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH, weight_col: str | None = None,
              group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of an item stream:
    a (depth × width) counter grid where row d counts items hashing to
    bucket md5(d ':' item) % width. Returns the grid as (d, bucket, cnt)
    rows — at most depth*width rows no matter the stream size, built with
    ONE aggregation whose shuffle carries bounded-cardinality keys (the
    map-side partial aggregation collapses the stream to ≤ depth*width
    rows per partition before the exchange).

    ``weight_col`` lets a caller that ALREADY holds per-item counts (a
    wordcount relation) fold them in without replaying the raw stream:
    each row contributes weight instead of 1 — identical grid, and the
    depth-way explode runs over vocab rows instead of every occurrence.

    Unlike a random-seeded CMS, the hash family is md5-derived, so the
    grid — and therefore every estimate read from it — is fully
    deterministic and replayable in the DuckDB oracle.

    ``group_cols`` builds one grid PER group value in a single
    aggregation (e.g. a side tag when sketching both inputs of a join in
    one pass) — the output is keyed (*group_cols, d, bucket) and stays
    bounded at groups * depth * width rows."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = items.select(
        *group_cols,
        w.cast("bigint").alias("_w"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    _cms_bucket(F.col(col), d, width),
                )
                for d in range(depth)
            ])
        ).alias("_h"),
    )
    return rows.groupBy(*group_cols, "_h.d", "_h.bucket").agg(
        F.sum("_w").cast("bigint").alias("cnt")
    )


def cms_estimate(grid: DataFrame, probes: DataFrame, col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate counts for probe items from a CMS grid: per item,
    the MINIMUM of its depth bucket counters (missing bucket rows mean a
    zero counter). Estimates are biased high: est ≥ true count always,
    with overshoot ≤ stream_len * e/width at ~1-e^-depth confidence.

    Shape: the probe side explodes to depth rows per item and joins the
    (≤ depth*width row) grid — broadcast when the grid fits (it does at
    the default 4×2048 = 8192 rows), then one min-aggregation per item."""
    pr = probes.select(
        F.col(col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    _cms_bucket(F.col(col), d, width),
                )
                for d in range(depth)
            ])
        ).alias("_h"),
    )
    joined = pr.join(
        F.broadcast(grid),
        (pr["_h.d"] == grid["d"]) & (pr["_h.bucket"] == grid["bucket"]),
        "left",
    )
    return joined.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est_cnt")
    )


def cms_oracle_sql(item_sql: str, probe_sql: str, out_col: str,
                   depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> str:
    """DuckDB replay of cms_build + cms_estimate. ``item_sql`` yields one
    column ``item``; ``probe_sql`` yields the distinct probe items as
    ``item``."""
    grid_rows = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {cms_bucket_sql('item', d, width)} AS bucket FROM items"
        for d in range(depth)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT item, {d} AS d, {cms_bucket_sql('item', d, width)} AS bucket FROM probes"
        for d in range(depth)
    )
    return f"""
WITH items AS ({item_sql}),
grid AS (
  SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM ({grid_rows})
  GROUP BY 1, 2
),
probes AS ({probe_sql}),
pr AS ({probe_rows})
SELECT pr.item AS {out_col},
       CAST(min(coalesce(grid.cnt, 0)) AS BIGINT) AS est_cnt
FROM pr LEFT JOIN grid ON pr.d = grid.d AND pr.bucket = grid.bucket
GROUP BY pr.item
"""


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Merge CMS grids built with the same (depth, width, hash family):
    counter-wise sum — the mergeability that makes the sketch a
    distributed/incremental summary (per-shard grids fold into a corpus
    grid; a steady-state ingest adds each batch's grid to the parked
    snapshot grid, the signature-store pattern)."""
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def cms_join_cardinality(grid_a: DataFrame, grid_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two CMS grids (the classic
    inner-product estimator, Cormode & Muthukrishnan 2005 §4.2):
    for each depth row, sum over buckets of cntA*cntB; report the MINIMUM
    across depths. Biased high like point estimates (collisions only add
    mass), exact when no bucket collides. All integer arithmetic over
    two ≤ depth*width-row relations — a join-size planner that never
    touches the data, the kind of estimate a 100 TB optimizer wants
    before committing to a shuffle strategy.

    Returns a single row (est_cardinality bigint)."""
    a = grid_a.select("d", "bucket", F.col("cnt").alias("ca"))
    b = grid_b.select("d", "bucket", F.col("cnt").alias("cb"))
    per_depth = (
        a.join(b, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    return per_depth.agg(F.min("ip").cast("bigint").alias("est_cardinality"))
