"""Heavy-hitter operator tests: exactness, partitioning independence, the
Misra–Gries superset guarantee on skewed data, and the bounded candidate
shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_1_spark.operators import sketches


def _freqs(rows):
    return {r["item"]: r["cnt"] for r in rows}


@pytest.fixture(scope="module")
def skewed(spark):
    """900 copies of 3 hot keys + 1000 unique keys: n=3700, so with k=30
    the threshold is 3700//31 = 119 — exactly the hot keys qualify."""
    hot = spark.range(2700).select(
        F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")).alias("item")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("item")
    )
    return hot.unionAll(tail)


def test_heavy_hitters_exact_on_skew(spark, skewed):
    out = sketches.heavy_hitters(skewed, "item", k=30).collect()
    assert _freqs(out) == {"hot0": 900, "hot1": 900, "hot2": 900}
    assert all(r["threshold"] == 3700 // 31 for r in out)


def test_heavy_hitters_mg_matches_jvm_path(spark, skewed):
    jvm = sketches.heavy_hitters(skewed, "item", k=30).collect()
    mg = sketches.heavy_hitters_mg(skewed, "item", k=30).collect()
    assert sorted(map(tuple, jvm)) == sorted(map(tuple, mg))


@pytest.mark.parametrize("parts", [1, 7])
def test_partitioning_independence(spark, skewed, parts):
    """The candidate set varies with partitioning; the exact final answer
    must not."""
    re = skewed.repartition(parts)
    out = sketches.heavy_hitters(re, "item", k=30).collect()
    assert _freqs(out) == {"hot0": 900, "hot1": 900, "hot2": 900}
    mg = sketches.heavy_hitters_mg(re, "item", k=30).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, mg))


def test_mg_candidate_bound_per_partition(spark):
    """The MG sketch emits at most k candidate rows per partition even
    when the vocabulary is much larger than k."""
    k = 10
    uniq = spark.range(5000).select(F.col("id").cast("string").alias("_item"))
    uniq = uniq.repartition(4)

    import pandas as pd

    # Reuse the partition sketch through the public operator by counting
    # the candidate relation's size: ≤ k * num_partitions.
    items = uniq
    # Build the candidate stage exactly as heavy_hitters_mg does.
    from collections.abc import Iterator

    def mg_partition(batches: Iterator[pd.DataFrame]):
        counters: dict[str, int] = {}
        for pdf in batches:
            for it in pdf["_item"]:
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
        yield pd.DataFrame({"_item": list(counters.keys())})

    cand = items.mapInPandas(mg_partition, schema="_item string")
    assert cand.count() <= k * 4


def test_no_heavy_hitters_on_uniform_unique(spark):
    """All-unique stream: no item can pass the exact threshold."""
    uniq = spark.range(500).select(F.col("id").cast("string").alias("item"))
    assert sketches.heavy_hitters(uniq, "item", k=5).count() == 0
    assert sketches.heavy_hitters_mg(uniq, "item", k=5).count() == 0


def test_cms_overestimates_never_under(spark, skewed):
    """CMS point estimates are biased high: est >= true for every item."""
    grid = sketches.cms_build(skewed, "item", depth=3, width=64)
    probes = skewed.distinct()
    est = {
        r["item"]: r["est_cnt"]
        for r in sketches.cms_estimate(grid, probes, "item", depth=3, width=64).collect()
    }
    true = {
        r["item"]: r["cnt"]
        for r in skewed.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(est) == set(true)
    assert all(est[i] >= true[i] for i in true)


def test_cms_exact_when_wide(spark):
    """With width >> distinct items, collisions are unlikely and the
    estimate is exact for this fixed md5 hash family (verified, not
    probabilistic: this asserts the actual fixture behavior)."""
    df = spark.range(300).select((F.col("id") % 10).cast("string").alias("item"))
    grid = sketches.cms_build(df, "item", depth=4, width=4096)
    est = {
        r["item"]: r["est_cnt"]
        for r in sketches.cms_estimate(grid, df.distinct(), "item", depth=4, width=4096).collect()
    }
    assert est == {str(i): 30 for i in range(10)}


def test_cms_absent_probe_small(spark):
    """A probe never seen in the stream estimates only collision mass —
    0 with a wide grid."""
    df = spark.range(100).select(F.lit("present").alias("item"))
    probes = spark.createDataFrame([("absent",)], "item string")
    grid = sketches.cms_build(df, "item", depth=4, width=4096)
    out = sketches.cms_estimate(grid, probes, "item", depth=4, width=4096).collect()
    assert out[0]["est_cnt"] == 0


def test_cms_grid_bounded(spark):
    """The grid never exceeds depth*width rows however large the stream."""
    df = spark.range(20000).select(F.col("id").cast("string").alias("item"))
    grid = sketches.cms_build(df, "item", depth=2, width=32)
    assert grid.count() <= 2 * 32


def test_cms_merge_equals_whole(spark):
    """Grid of the union == counter-wise merge of per-shard grids."""
    a = spark.range(200).select((F.col("id") % 7).cast("string").alias("item"))
    b = spark.range(300).select((F.col("id") % 5).cast("string").alias("item"))
    whole = sketches.cms_build(a.unionAll(b), "item", depth=3, width=64)
    merged = sketches.cms_merge(
        sketches.cms_build(a, "item", depth=3, width=64),
        sketches.cms_build(b, "item", depth=3, width=64),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_cms_join_cardinality_bounds(spark):
    """Inner-product estimate upper-bounds the true equi-join size and is
    exact with a wide grid (no collisions for 10 keys)."""
    a = spark.range(100).select((F.col("id") % 10).alias("k"))  # 10 each
    b = spark.range(30).select((F.col("id") % 5).alias("k"))    # keys 0-4, 6 each
    true = a.join(b, "k").count()  # 5 keys * 10 * 6 = 300
    ga = sketches.cms_build(a, "k", depth=4, width=4096)
    gb = sketches.cms_build(b, "k", depth=4, width=4096)
    est = sketches.cms_join_cardinality(ga, gb).collect()[0]["est_cardinality"]
    assert est == true == 300
    # narrow grid: estimate may exceed but never undercuts
    ga2 = sketches.cms_build(a, "k", depth=2, width=8)
    gb2 = sketches.cms_build(b, "k", depth=2, width=8)
    est2 = sketches.cms_join_cardinality(ga2, gb2).collect()[0]["est_cardinality"]
    assert est2 >= true
