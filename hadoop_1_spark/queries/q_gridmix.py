"""Gridmix-shaped benchmark queries (SURVEY.md §6 / §7 Phase 8): the
reference's published workload *shapes* reproduced as deterministic,
oracle-checked queries at driver scale.

- gridmix_three_stage   : job 1 — three chained stages with keep-ratios
  (src/benchmarks/gridmix/README:27-37; 10/40% -> 100% -> sort), using
  md5-bucket deterministic sampling instead of random keep.
- gridmix_reference_select : job 3 — highly selective scan (keep ~0.2%)
  aggregated into a single sorted reducer
  (src/benchmarks/gridmix/README:46-52).

The large-sort shape (job 2) is covered by terasort_validate; job 5 (the
API text sort: java vs pipes vs streaming, README:66-72) is the
``gridmix_api_sort_*`` trio below — the SAME variable-KV sort through the
three mapper APIs, one bench row each, one shared oracle.
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


@register(
    "gridmix_varkv_sort",
    oracle="""
WITH kv AS (
  SELECT array_to_string((list_filter(string_split_regex(trim(text), '\\s+'),
                                      x -> x <> ''))[1:5], ' ') AS k,
         doc_id, text
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS records,
       min(k) AS min_key,
       max(k) AS max_key,
       CAST(sum(('0x' || substr(md5(k || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
            AS BIGINT) AS checksum,
       TRUE AS is_sorted
FROM kv
""",
)
def gridmix_varkv_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gridmix job-2 shape (gridmix/README:39-44): large sort of VARIABLE
    key/value records — (5-word key, full-document value) from documents,
    total-order sorted on the key, then validated with the SortValidator
    invariants (count, min/max, order-insensitive checksum, global
    sortedness). Same sampled-range-partition sort as terasort, but over
    skewed variable-length records instead of fixed 100-byte rows."""
    from hadoop_1_spark.operators import sort
    from hadoop_1_spark.operators.textops import ws_tokens

    docs = _load(spark, sf_dir, "documents")
    kv = docs.select(
        F.array_join(F.slice(ws_tokens(F.col("text")), 1, 5), " ").alias("k"),
        "doc_id",
        "text",
    )
    chk = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("k"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    sorted_df = sort.total_order_sort(kv.withColumn("chk", chk), "k", "doc_id")
    return sort.sort_validate(sorted_df, F.col("k"), checksum=F.col("chk")).select(
        "records", "min_key", "max_key", "checksum", "is_sorted"
    )


# Gridmix job-5 (README:66-72): the same text sort exercised through each
# map/reduce API. All three variants extract a 1-10-word key (first 5
# whitespace tokens) per document, total-order sort (k, doc_id), and emit
# the SortValidator invariants; they share this oracle, so the driver
# hash-checks that the external-process paths are bit-identical to the
# built-in one.
_JOB5_ORACLE = """
WITH kv AS (
  SELECT array_to_string((list_filter(string_split_regex(trim(text), '\\s+'),
                                      x -> x <> ''))[1:5], ' ') AS k,
         doc_id
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS records,
       min(k) AS min_key,
       max(k) AS max_key,
       CAST(sum(('0x' || substr(md5(k || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
            AS BIGINT) AS checksum,
       TRUE AS is_sorted
FROM kv
"""


def _job5_validate(kv: DataFrame) -> DataFrame:
    """Sort (k, doc_id) globally and reduce to the SortValidator row."""
    from hadoop_1_spark.operators import sort

    chk = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("k"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    sorted_df = sort.total_order_sort(kv.withColumn("chk", chk), "k", "doc_id")
    return sort.sort_validate(sorted_df, F.col("k"), checksum=F.col("chk")).select(
        "records", "min_key", "max_key", "checksum", "is_sorted"
    )


def _job5_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) with in-band tabs/newlines flattened to spaces so the
    line framing of the external-process APIs is unambiguous. \\s+ token
    splitting is insensitive to the flattening, so all variants (and the
    oracle, which reads the raw text) see identical token lists."""
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.regexp_replace("text", r"[\t\n\r]", " ").alias("text"),
    )


def _job5_parse(lines: DataFrame) -> DataFrame:
    """stdout lines ``key<TAB>doc_id`` -> (k, doc_id)."""
    return lines.select(
        F.substring_index("line", "\t", 1).alias("k"),
        F.substring_index("line", "\t", -1).cast("long").alias("doc_id"),
    )


@register("gridmix_api_sort_builtin", oracle=_JOB5_ORACLE)
def gridmix_api_sort_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-5 variant 1 ('java'): key extraction as built-in expressions —
    whole-stage-codegen'd, the native API of this engine."""
    from hadoop_1_spark.operators.textops import ws_tokens

    docs = _load(spark, sf_dir, "documents")
    kv = docs.select(
        F.array_join(F.slice(ws_tokens(F.col("text")), 1, 5), " ").alias("k"),
        "doc_id",
    )
    return _job5_validate(kv)


@register("gridmix_api_sort_streaming", oracle=_JOB5_ORACLE)
def gridmix_api_sort_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-5 variant 2 ('streaming'): the key mapper is an external script
    on Hadoop-Streaming line framing via rdd.pipe — one process per
    partition, a record per line round-trip."""
    import sys

    from hadoop_1_spark.ext import asset_path
    from hadoop_1_spark.operators import pipes

    cmd = f"{sys.executable} {asset_path('keymap_5words.py')}"
    out = pipes.pipe_lines(_job5_lines(spark, sf_dir), cmd)
    return _job5_validate(_job5_parse(out))


@register("gridmix_api_sort_pipes", oracle=_JOB5_ORACLE)
def gridmix_api_sort_pipes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-5 variant 3 ('pipes' analog): the same external mapper fed
    Arrow batches via subprocess_map_batches — fork-per-batch instead of
    the framework-native API, the efficient external-process path."""
    import sys

    from hadoop_1_spark.ext import asset_path
    from hadoop_1_spark.operators import pipes

    out = pipes.subprocess_map_batches(
        _job5_lines(spark, sf_dir),
        [sys.executable, asset_path("keymap_5words.py")],
    )
    return _job5_validate(_job5_parse(out))


@register(
    "gridmix_indirect_read",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY user_id
""",
)
def gridmix_indirect_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gridmix job-4 shape (gridmix/README:54-64): iterated indirect read —
    iteration i processes a fresh 10% slice of the input PLUS the whole of
    iteration i-1's output, re-aggregating each time (10 chained
    shuffle stages, the reference's 10-iteration indirect-input loop).
    The reference materializes each iteration as files and feeds them back
    'sans locality metadata'; the Spark-first equivalent keeps the loop as
    lineage so AQE plans each reduce on the actual intermediate sizes.
    Final state = per-user event counts over all 10 slices (the oracle's
    closed form)."""
    ev = _load(spark, sf_dir, "events")
    state = None
    for i in range(10):
        slice_i = (
            ev.where(md5_mod(F.col("event_id"), 10) == i)
            .groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n"))
        )
        if state is None:
            state = slice_i
        else:
            state = (
                state.unionByName(slice_i)
                .groupBy("user_id")
                .agg(F.sum("n").cast("long").alias("n"))
            )
    return state
