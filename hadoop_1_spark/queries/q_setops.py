"""Set operations (SURVEY.md §2.7) + MultipleInputs union + the PiEstimator
compute pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.registry import _load, register
from hadoop_1_spark.sources import io

PI_POINTS = 1_000_000
# 48-bit LCG (the classic drand48 multiplier/addend) — pure int64 arithmetic,
# bit-identical in Spark and DuckDB.
_LCG_A, _LCG_C, _LCG_M = 25214903917, 11, 2**48


@register(
    "union_multi_inputs",
    oracle="""
SELECT * FROM (
  SELECT CAST(o_orderkey AS VARCHAR) AS key, o_orderpriority AS value, 'orders' AS _source
  FROM orders
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR) AS key, NULL AS value, 'lineitem' AS _source
  FROM lineitem WHERE l_linenumber = 1
)
""",
)
def union_multi_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleInputs/DelegatingMapper (S9, mapred/lib/MultipleInputs.java:34):
    two sources, each with its own per-path projection, unioned by name with
    missing columns null + source lineage tag."""
    o = _load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_orderpriority").alias("value"),
    )
    li = (
        _load(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(F.col("l_orderkey").cast("string").alias("key"))
    )
    return io.multiple_inputs(("orders", o), ("lineitem", li))


@register(
    "distinct_keys",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-keys idiom (SetFile io/SetFile.java:27 / UniqValueCount set):
    map-side-combined distinct — one shuffle on the key pair."""
    return _load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "set_except",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (customers with no orders). No library operator in the
    reference (§2.7: hand-written reducer idiom); Spark's except / left_anti
    is the free extension — planned as an aggregated anti semi-join."""
    c = _load(spark, sf_dir, "customer").select("c_custkey")
    o = _load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


@register(
    "set_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_acctbal < 0
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (negative-balance customers that have orders) — the
    override-minus/inner-join idiom as a first-class set op."""
    c = _load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0).select("c_custkey")
    o = _load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@register(
    "pi_estimator",
    oracle=f"""
WITH pts AS (
  SELECT ((i * {_LCG_A} + {_LCG_C}) % {_LCG_M}) / {_LCG_M}.0 AS x,
         (((i + {PI_POINTS}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}) / {_LCG_M}.0 AS y
  FROM range({PI_POINTS}) t(i)
)
SELECT CAST(count(*) AS BIGINT) AS inside,
       CAST({PI_POINTS} AS BIGINT) AS total,
       CAST(4.0 * count(*) AS DOUBLE) / {PI_POINTS} AS pi_estimate
FROM pts
WHERE (x - 0.5) * (x - 0.5) + (y - 0.5) * (y - 0.5) <= 0.25
""",
)
def pi_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PiEstimator (examples/PiEstimator.java:66): quasi-random points in the
    unit square, count inside the inscribed circle, combiner-summed. The
    reference uses a Halton sequence for determinism; we use an LCG stream —
    same deterministic-low-discrepancy intent, expressible as pure int64
    arithmetic in both engines. Fully distributed: spark.range + one agg."""
    i = F.col("id")
    x = ((i * _LCG_A + _LCG_C) % _LCG_M) / F.lit(float(_LCG_M))
    y = (((i + PI_POINTS) * _LCG_A + _LCG_C) % _LCG_M) / F.lit(float(_LCG_M))
    pts = spark.range(PI_POINTS).select(x.alias("x"), y.alias("y"))
    inside = pts.filter(
        (F.col("x") - 0.5) * (F.col("x") - 0.5) + (F.col("y") - 0.5) * (F.col("y") - 0.5)
        <= 0.25
    )
    return inside.agg(
        F.count("*").cast("bigint").alias("inside"),
        F.lit(PI_POINTS).cast("bigint").alias("total"),
        (F.lit(4.0) * F.count("*") / F.lit(PI_POINTS)).alias("pi_estimate"),
    )


@register(
    "pentomino_search",
    oracle="SELECT CAST(92 AS BIGINT) AS solutions",
)
def pentomino_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistributedPentomino pattern (examples/dancing/DistributedPentomino.java:44):
    partition a search space by prefix, solve each prefix independently,
    sum. Here: 8-queens split by first-row column (8 prefixes fan out
    across executors); the solution count 92 is the verifiable invariant."""
    from pyspark.sql import functions as F

    def solutions_for_first_col(c0: int) -> int:
        def ok(cols, c):
            r = len(cols)
            return all(c != cc and abs(c - cc) != r - rr for rr, cc in enumerate(cols))

        def solve(cols):
            if len(cols) == 8:
                return 1
            return sum(solve(cols + [c]) for c in range(8) if ok(cols, c))

        return solve([c0])

    counts = (
        spark.range(0, 8, 1, 8)
        .rdd.map(lambda r: solutions_for_first_col(r["id"]))
        .map(lambda n: (n,))
    )
    df = spark.createDataFrame(counts, "n long")
    return df.agg(F.sum("n").cast("long").alias("solutions"))


@register(
    "pentomino_dancing",
    oracle="""
SELECT CAST(10 AS INT) AS width, CAST(6 AS INT) AS height,
       CAST(3199 AS BIGINT) AS n_prefixes, CAST(2339 AS BIGINT) AS solutions
""",
)
def pentomino_dancing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL DistributedPentomino (examples/dancing/
    DistributedPentomino.java:37-75 + Pentomino.java exact-cover model):
    full 6x10 pentomino tiling via Algorithm X, prefix-split at depth 4
    into 3199 independent tasks like the reference's map-over-prefixes
    job (depth 3's 548 coarse prefixes left two straggler tasks pinning
    the wall clock — finer tasks halved it, 16.9 -> 9.0 s on local[32];
    the same depth+1 lever the reference's docs prescribe for bigger
    clusters). The oracle pins the published invariant — 2339 distinct
    6x10 pentomino solutions (the x-in-upper-left-quadrant constraint,
    Pentomino.java:292-294, makes each symmetry class count once) — the
    same external check the reference relies on; DuckDB cannot replay a
    backtracking search. Kept out of BENCH_QUERIES: the invariant is the
    point, not throughput. See operators/pentomino.py."""
    from hadoop_1_spark.operators import pentomino

    return pentomino.solve_distributed(spark, width=10, height=6, depth=4)
