"""Gridmix-shaped benchmark queries (SURVEY.md §6 / §7 Phase 8): the
reference's published workload *shapes* reproduced as deterministic,
oracle-checked queries at driver scale.

- gridmix_three_stage   : job 1 — three chained stages with keep-ratios
  (src/benchmarks/gridmix/README:27-37; 10/40% -> 100% -> sort), using
  md5-bucket deterministic sampling instead of random keep.
- gridmix_reference_select : job 3 — highly selective scan (keep ~0.2%)
  aggregated into a single sorted reducer
  (src/benchmarks/gridmix/README:46-52).

The large-sort shape (job 2) is covered by terasort_validate; the API
comparison (job 5, java vs streaming) by wordcount vs pipe_wordcount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators.sampling import md5_mod
from hadoop_1_spark.registry import _load, register


def _sql_md5_mod(expr: str, f: int) -> str:
    """DuckDB twin of sampling.md5_mod (values are non-negative, so % ==
    pmod)."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT % {f})"


_LKEY = "l_orderkey || ':' || l_linenumber"


@register(
    "gridmix_three_stage",
    oracle=f"""
WITH s1 AS (
  SELECT * FROM lineitem
  WHERE {_sql_md5_mod(_LKEY, 10)} = 0
),
r1 AS (
  SELECT l_orderkey,
         sum(CAST(l_quantity AS DECIMAL(18,4))) AS q,
         count(*) AS c
  FROM s1 GROUP BY l_orderkey
),
r1k AS (SELECT * FROM r1 WHERE {_sql_md5_mod("l_orderkey", 5)} < 2),
r2 AS (
  SELECT {_sql_md5_mod("l_orderkey", 100)} AS bucket,
         CAST(sum(q) AS DOUBLE) AS sum_qty,
         CAST(sum(c) AS BIGINT) AS n_orders
  FROM r1k GROUP BY 1
)
SELECT bucket, sum_qty, n_orders FROM r2 ORDER BY bucket
""",
)
def gridmix_three_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gridmix job-1 shape: keep 10% map-side, aggregate, keep 40% of
    groups, re-aggregate into 100 buckets, total-order sort."""
    li = _load(spark, sf_dir, "lineitem")
    key = F.concat_ws(":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    s1 = li.where(md5_mod(key, 10) == 0)
    r1 = s1.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"),
        F.count("*").alias("c"),
    )
    r1k = r1.where(md5_mod(F.col("l_orderkey"), 5) < 2)
    r2 = r1k.groupBy(md5_mod(F.col("l_orderkey"), 100).alias("bucket")).agg(
        F.sum("q").cast("double").alias("sum_qty"),
        F.sum("c").cast("long").alias("n_orders"),
    )
    return r2.orderBy("bucket")


@register(
    "gridmix_reference_select",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE {_sql_md5_mod(_LKEY, 500)} = 0
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def gridmix_reference_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gridmix job-3 shape: ~0.2% selective scan into one sorted reducer.
    The filter is evaluated at the scan (whole-stage codegen); the final
    coalesce(1) mirrors the single-reducer output contract."""
    li = _load(spark, sf_dir, "lineitem")
    key = F.concat_ws(":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    return (
        li.where(md5_mod(key, 500) == 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
        )
        .coalesce(1)
        .orderBy("l_returnflag", "l_linestatus")
    )
