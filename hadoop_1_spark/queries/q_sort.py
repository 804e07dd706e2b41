"""Sort-family queries (SURVEY.md §2.6): global total-order sort, key-field
sort-spec compiler, secondary sort, top-k, and the TeraGen/TeraSort/
TeraValidate pipeline.

Ordering queries are verified through explicit ``row_number`` ranks: the
driver's value-hash is order-insensitive, so the *rank column itself* carries
the order assertion. Ranks are computed distributed (sort.global_rank:
range shuffle + per-partition row_number + broadcast offsets — no global
single-partition window); the production output of a total-order sort is the
range-partitioned sorted write (``df.orderBy(...).write``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import keyfield, sort
from hadoop_1_spark.registry import _load, register

# Six dash-joined string fields from lineitem (fixture F3, as in q_fieldsel).
_LINE_COLS = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity", "l_partkey"]
# Unix-sort spec: field 5 (l_quantity) numeric descending, then field 1
# (l_orderkey) numeric ascending — KeyFieldBasedComparator "-k5,5nr -k1,1n".
KEYFIELD_SPEC = "-k5,5nr -k1,1n"


def _lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return li.select(
        F.concat_ws("-", *[F.col(c).cast("string") for c in _LINE_COLS]).alias("line")
    )


@register(
    "keyfield_sort",
    oracle="""
WITH f AS (
  SELECT concat_ws('-',
    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
    l_returnflag, l_linestatus,
    CAST(l_quantity AS VARCHAR), CAST(l_partkey AS VARCHAR)) AS line
  FROM lineitem
)
SELECT CAST(row_number() OVER (
         ORDER BY CAST(string_split(line, '-')[5] AS DOUBLE) DESC,
                  CAST(string_split(line, '-')[1] AS DOUBLE) ASC,
                  line ASC) AS BIGINT) AS rank,
       line
FROM f
""",
)
def keyfield_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unix-sort key-field spec "-k5,5nr -k1,1n" compiled to sort expressions
    (mapred/lib/KeyFieldBasedComparator.java:46, KeyFieldHelper spec grammar).
    Rank column asserts the global order; whole-line tiebreak for determinism
    (sort(1) last-resort compare; line is unique, so the order is total).
    Rank is computed distributed (sort.global_rank: range shuffle +
    per-partition positions + broadcast offsets), never via a global
    single-partition window. Sort keys are materialized as columns before
    the range sort so the split+cast runs once per row, not once each for
    the range sampler, the partitioner, and the sort."""
    lines = _lines(spark, sf_dir)
    keys = keyfield.compile_sort_keys(F.col("line"), KEYFIELD_SPEC, separator="-")
    aug = lines.select(
        "line", *[e.alias(f"_k{i}") for i, (e, _) in enumerate(keys)]
    )
    order = [
        F.col(f"_k{i}").desc() if rev else F.col(f"_k{i}").asc()
        for i, (_, rev) in enumerate(keys)
    ]
    return sort.global_rank(aug, *order, F.col("line").asc()).select("rank", "line")


@register(
    "keyfield_sort_global",
    oracle="""
WITH f AS (
  SELECT concat_ws('-',
    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
    l_returnflag, l_linestatus,
    CAST(l_quantity AS VARCHAR), CAST(l_partkey AS VARCHAR)) AS line
  FROM lineitem
)
SELECT CAST(row_number() OVER (ORDER BY line DESC) AS BIGINT) AS rank, line
FROM f
""",
)
def keyfield_sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag-only sort spec ``-r``: parseOption with global flags but NO -k
    specs lands on the global KeyDescription as the sole key — the whole
    line, reverse (KeyFieldHelper.java:183-192, the keySpecSeen branch
    r9/r10 pinned in parse_sort_spec). The compiled key IS the whole line
    (keyfield.is_whole_line: split-then-rejoin is the identity), so this
    is a reverse total-order text sort ordered on the line column itself —
    the range shuffle and the global_rank cache carry ONE string per row,
    not a line + byte-identical key duplicate (round-11 scale fix:
    sf1 25.3 -> 13.0 s, 9.0x -> ~4.5x on 10x data). The line relation is
    persisted BEFORE global_rank (round-13): repartitionByRange runs its
    child twice (a range-sampling job, then the shuffle), so a non-trivial
    lineage (scan + 6-field concat here) pays double without it —
    measured 16.5 -> 13.0 s at sf1. Rank asserts the global order exactly
    as keyfield_sort does (lines are unique, so the order is total
    without a tiebreak)."""
    from hadoop_1_spark.operators.caching import persist_tracked

    lines = persist_tracked(_lines(spark, sf_dir))
    specs = keyfield.parse_sort_spec("-r")
    assert (
        len(specs) == 1 and specs[0].reverse and keyfield.is_whole_line(specs[0])
    ), "flag-only spec must be whole-line reverse"
    return sort.global_rank(lines, F.col("line").desc()).select("rank", "line")


@register(
    "top_k",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (Grep.java:71-84 single-reducer pattern / gridmix "reference
    select"): orderBy().limit(k) runs per-partition top-k + an O(k) driver
    merge — no single-reducer bottleneck at 100 TB."""
    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    return sort.top_k(orders, 25, F.desc("o_totalprice"), F.asc("o_orderkey"))


@register(
    "secondary_sort",
    oracle="""
SELECT o_custkey,
       CAST(row_number() OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC) AS INT) AS rn,
       o_orderkey
FROM orders
""",
)
def secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort, query form (examples/SecondarySort.java:51: partition
    by key-part, order values within the group): per-customer order sequence
    by date. Shuffles once on o_custkey; the rank window reuses that
    partitioning (no second exchange)."""
    orders = _load(spark, sf_dir, "orders")
    ranked = sort.secondary_sort_rank(
        orders, "o_custkey", F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return ranked.select("o_custkey", F.col("rn").cast("int").alias("rn"), "o_orderkey")


# TeraGen row count for the synthetic pipeline (sf-independent).
TERA_ROWS = 100_000


@register(
    "terasort_validate",
    oracle=f"""
WITH gen AS (
  SELECT md5(CAST(i AS VARCHAR)) AS key,
         CAST(concat('0x', substr(md5(CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) AS chk
  FROM range({TERA_ROWS}) t(i)
)
SELECT CAST(count(*) AS BIGINT) AS records,
       min(key) AS min_key,
       max(key) AS max_key,
       CAST(sum(chk) AS BIGINT) AS checksum,
       TRUE AS is_sorted
FROM gen
""",
)
def terasort_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TeraGen -> TeraSort -> TeraValidate (examples/terasort/TeraGen.java:60,
    TeraSort.java:50, TeraValidate.java:52,79): synthesize keyed rows from
    spark.range (S14/S16 generator parity), total-order sort them (O1/O2 —
    Spark's RangePartitioner = sampled split points, the TotalOrderPartitioner
    design), then validate count + min/max + order-insensitive checksum +
    global sortedness in one pass (SortValidator.java:93-173 invariants).
    The oracle recomputes the invariants; is_sorted=TRUE is the assertion."""
    gen = spark.range(TERA_ROWS).select(
        F.md5(F.col("id").cast("string")).alias("key"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("chk"),
    )
    sorted_df = sort.total_order_sort(gen, "key")
    return sort.sort_validate(sorted_df, F.col("key"), checksum=F.col("chk")).select(
        "records", "min_key", "max_key", "checksum", "is_sorted"
    )


@register(
    "secondary_sort_iterator",
    oracle="""
WITH d AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
)
SELECT user_id,
       CAST(count(*) + 1 AS BIGINT) AS n_events,
       CAST(max(t - prev) AS BIGINT) AS max_gap_us
FROM d WHERE prev IS NOT NULL
GROUP BY user_id
""",
)
def secondary_sort_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user max inter-event gap via the applyInPandas sorted-iterator
    contract: each group arrives ts-ordered, consecutive deltas computed
    imperatively (what a reference reducer would do with its sorted values
    iterator). Oracle = the declarative lag() twin. Users with one event
    have no gap and are dropped (matching the reducer that never emits)."""
    import pandas as pd

    from hadoop_1_spark.operators.sort import grouped_sorted_apply
    from hadoop_1_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("t")
    )

    def max_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["user_id", "n_events", "max_gap_us"]).astype(
                {"user_id": "int64", "n_events": "int64", "max_gap_us": "int64"}
            )
        gaps = pdf["t"].diff().dropna()
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "max_gap_us": [int(gaps.max())],
            }
        )

    return grouped_sorted_apply(
        ev, "user_id", "t", max_gap, "user_id long, n_events long, max_gap_us long"
    )


ZBITS = 16
ZBUCKET_DIV = 1 << (2 * ZBITS - 8)  # top 8 bits of the 32-bit z-key
_ZMAX = (1 << ZBITS) - 1


@register(
    "layout_zorder",
    oracle=f"""
WITH b AS (
  SELECT min(l_partkey) AS mn_pk, max(l_partkey) AS mx_pk,
         min(l_suppkey) AS mn_sk, max(l_suppkey) AS mx_sk
  FROM lineitem
),
s AS (
  SELECT ((l_partkey - mn_pk) * {_ZMAX}) // greatest(mx_pk - mn_pk, 1) AS xs,
         ((l_suppkey - mn_sk) * {_ZMAX}) // greatest(mx_sk - mn_sk, 1) AS ys,
         l_partkey, l_suppkey
  FROM lineitem, b
),
z AS (
  SELECT {sort.zorder_sql("xs", "ys", 16, div="//")} // {ZBUCKET_DIV} AS zbucket,
         l_partkey, l_suppkey
  FROM s
)
SELECT CAST(zbucket AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_partkey) AS BIGINT) AS min_pk, CAST(max(l_partkey) AS BIGINT) AS max_pk,
       CAST(min(l_suppkey) AS BIGINT) AS min_sk, CAST(max(l_suppkey) AS BIGINT) AS max_sk
FROM z GROUP BY zbucket
""",
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key clustering report: domain-normalize (l_partkey,
    l_suppkey) to the full 16-bit range (the range-binning a real
    OPTIMIZE ZORDER performs, here with exact integer arithmetic from a
    1-row broadcast of the domain bounds), bucket by the z-key's top 8
    bits, and report each bucket's row count and per-dimension min/max
    envelope — the rectangle the bucket's file would cover, i.e. the
    min/max footer stats a z-ordered write gives a scan planner in BOTH
    dimensions. See sort.zorder_sql / write_zordered."""
    li = _load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").alias("mn_pk"),
        F.max("l_partkey").alias("mx_pk"),
        F.min("l_suppkey").alias("mn_sk"),
        F.max("l_suppkey").alias("mx_sk"),
    )
    scaled = li.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"((l_partkey - mn_pk) * {_ZMAX}) div greatest(mx_pk - mn_pk, 1)").alias("xs"),
        F.expr(f"((l_suppkey - mn_sk) * {_ZMAX}) div greatest(mx_sk - mn_sk, 1)").alias("ys"),
        "l_partkey",
        "l_suppkey",
    )
    z = scaled.select(
        (sort.zorder_key("xs", "ys", ZBITS) / ZBUCKET_DIV).cast("long").alias("zbucket"),
        "l_partkey",
        "l_suppkey",
    )
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("l_partkey").cast("bigint").alias("min_pk"),
        F.max("l_partkey").cast("bigint").alias("max_pk"),
        F.min("l_suppkey").cast("bigint").alias("min_sk"),
        F.max("l_suppkey").cast("bigint").alias("max_sk"),
    )


NPRUNE_BUCKETS = 16


@register(
    "layout_stats_prune",
    oracle=f"""
WITH b AS (SELECT min(l_orderkey) AS mn, max(l_orderkey) AS mx FROM lineitem),
z AS (
  SELECT ((l_orderkey - mn) * {NPRUNE_BUCKETS}) // (mx - mn + 1) AS bucket,
         l_orderkey
  FROM lineitem, b
),
m AS (
  SELECT bucket, count(*) AS n_rows,
         min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
  FROM z GROUP BY 1
),
w AS (SELECT mn + ((mx - mn) * 3) // 10 AS lo, mn + ((mx - mn) * 6) // 10 AS hi FROM b)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(min_key AS BIGINT) AS min_key, CAST(max_key AS BIGINT) AS max_key,
       (max_key >= lo AND min_key <= hi) AS selected
FROM m, w
""",
)
def layout_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data-skipping planner view: bucket lineitem into 16
    disjoint l_orderkey ranges (exact integer arithmetic from a 1-row
    broadcast of the domain bounds — the envelopes a range-sorted write
    gives each file), then evaluate a 30-60% domain-window predicate
    against each envelope. ``selected`` marks the files a pruned read
    would open — everything else is skipped before any scan starts. The
    real write -> manifest -> pruned-scan round trip (same math over
    actual parquet files) is sources/skipping.py, covered by
    tests/test_sources.py."""
    li = _load(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx")
    )
    z = li.crossJoin(F.broadcast(b)).select(
        F.expr(
            f"((l_orderkey - mn) * {NPRUNE_BUCKETS}) div (mx - mn + 1)"
        ).alias("bucket"),
        "l_orderkey",
        "mn",
        "mx",
    )
    m = z.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("l_orderkey").cast("bigint").alias("min_key"),
        F.max("l_orderkey").cast("bigint").alias("max_key"),
        F.first("mn").alias("mn"),
        F.first("mx").alias("mx"),
    )
    lo = F.col("mn") + F.expr("((mx - mn) * 3) div 10")
    hi = F.col("mn") + F.expr("((mx - mn) * 6) div 10")
    return m.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_rows",
        "min_key",
        "max_key",
        ((F.col("max_key") >= lo) & (F.col("min_key") <= hi)).alias("selected"),
    )
