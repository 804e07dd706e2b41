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


# ---------------------------------------------------------------------------
# Gridmix2: the XML-configured job MIX (README.gridmix2:20-66). The compiler
# (operators/gridmix2.py) expands the descriptor into per-job specs; the
# oracle below re-derives the same expansion in pure SQL from the embedded
# shipped property table — two independent implementations of
# GridMixRunner.addJobs + select (GridMixRunner.java:389-434).

def _gridmix2_oracle() -> str:
    from hadoop_1_spark.operators.gridmix2 import SHIPPED_MIX, SIZES

    red_default = {s: str(r) for s, _, r in SIZES}
    vals = ",\n  ".join(
        "('{}','{}',{},{},{},{},{},{})".format(
            cls,
            size,
            ci,
            si,
            f"'{jobs}'" if jobs is not None else "NULL",
            f"'{reds}'" if reds is not None else f"'{red_default[size]}'",
            moc if moc is not None else 0,
            oc if oc is not None else 0,
        )
        for ci, cls in enumerate(
            ["streamSort", "javaSort", "webdataScan", "combiner",
             "monsterQuery", "webdataSort"]
        )
        for si, size in enumerate(["small", "medium", "large"])
        for c2, s2, jobs, reds, moc, oc in SHIPPED_MIX
        if c2 == cls and s2 == size
    )
    return f"""
WITH props(job, size, job_ord, size_ord, jobs_csv, reduces_csv, n_moc, n_oc) AS (VALUES
  {vals}
),
grp AS (
  SELECT job, size, job_ord, size_ord, n_moc, n_oc,
         string_split(jobs_csv, ',') AS js,
         string_split(reduces_csv, ',') AS rs
  FROM props
),
pairs AS (
  SELECT job, size, job_ord, size_ord, n_moc, n_oc, gi,
         CAST(js[gi] AS INT) AS nj, CAST(rs[gi] AS INT) AS red
  FROM grp, (SELECT unnest(generate_series(1, 5)) AS gi) g
  WHERE gi <= len(js)
),
expanded AS (
  SELECT job, size, job_ord, size_ord, n_moc, n_oc, red,
         CAST(row_number() OVER (PARTITION BY job, size ORDER BY gi, e.j) - 1
              AS INT) AS idx,
         CAST(COUNT(*) OVER (PARTITION BY job, size) AS INT) AS total
  FROM pairs, (SELECT unnest(generate_series(1, 100)) AS j) e
  WHERE e.j <= nj
)
SELECT job, size, idx, red AS reducers,
       CASE WHEN n_moc <= 0 THEN FALSE WHEN n_moc >= total THEN TRUE
            ELSE idx <= (total - total % n_moc) - 1 AND idx % (total // n_moc) = 0
       END AS mapoutput_compressed,
       CASE WHEN n_oc <= 0 THEN FALSE WHEN n_oc >= total THEN TRUE
            ELSE idx <= (total - total % n_oc) - 1 AND idx % (total // n_oc) = 0
       END AS output_compressed,
       CASE WHEN job = 'monsterQuery' THEN 3 ELSE 1 END AS stages
FROM expanded
ORDER BY job_ord, size_ord, idx
"""


_GRIDMIX2_XML = (
    "/root/reference/src/benchmarks/gridmix2/gridmix_config.xml"
)


@register("gridmix2_mix", oracle=_gridmix2_oracle())
def gridmix2_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gridmix2 mix compilation: parse the reference's shipped
    gridmix_config.xml (falling back to the embedded copy of its property
    table) and expand it into the full 172-logical-job submission plan —
    per-instance reducer counts and the select()-spread compression flags.
    The oracle re-derives the expansion with SQL set operations from the
    same property literals, so the Python compiler and the SQL twin check
    each other."""
    import os

    from hadoop_1_spark.operators import gridmix2

    conf = (
        gridmix2.load_config_xml(_GRIDMIX2_XML)
        if os.path.exists(_GRIDMIX2_XML)
        else gridmix2.shipped_conf()
    )
    rows = [
        (
            s["job"], s["size"], s["idx"], s["reducers"],
            s["mapoutput_compressed"], s["output_compressed"], s["stages"],
        )
        for s in gridmix2.compile_mix(conf)
    ]
    return spark.createDataFrame(
        rows,
        "job string, size string, idx int, reducers int,"
        " mapoutput_compressed boolean, output_compressed boolean, stages int",
    )


_MINI_SCAN_KEY = "l_orderkey || ':' || l_linenumber"


def _mini_sort_row(spark: SparkSession, sf_dir: str, job: str, width: int) -> DataFrame:
    """One sort-class job of the mini-mix: (first ``width`` words, doc_id)
    total-order sort + SortValidator reduction -> (job, records, checksum)."""
    from hadoop_1_spark.operators.textops import ws_tokens

    docs = _load(spark, sf_dir, "documents")
    kv = docs.select(
        F.array_join(F.slice(ws_tokens(F.col("text")), 1, width), " ").alias("k"),
        "doc_id",
    )
    return _job5_validate(kv).select(
        F.lit(job).alias("job"),
        F.col("records"),
        F.col("checksum"),
    )


def _mini_sort_oracle(job: str, width: int) -> str:
    return f"""
SELECT '{job}' AS job, CAST(count(*) AS BIGINT) AS records,
       CAST(sum(('0x' || substr(md5(k || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
            AS BIGINT) AS checksum
FROM (
  SELECT array_to_string((list_filter(string_split_regex(trim(text), '\\s+'),
                                      x -> x <> ''))[1:{width}], ' ') AS k,
         doc_id
  FROM documents
)
"""


@register(
    "gridmix2_mini",
    oracle=f"""
{_mini_sort_oracle("streamSort", 5)}
UNION ALL
{_mini_sort_oracle("javaSort", 3)}
UNION ALL
SELECT 'webdataScan' AS job, CAST(count(*) AS BIGINT) AS records,
       CAST(sum(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT)
            AS BIGINT) AS checksum
FROM lineitem WHERE {_sql_md5_mod(_MINI_SCAN_KEY, 500)} = 0
UNION ALL
SELECT 'combiner' AS job, CAST(count(*) AS BIGINT) AS records,
       CAST(sum(('0x' || substr(md5(token || ':' || CAST(cnt AS VARCHAR)), 1, 8))::BIGINT)
            AS BIGINT) AS checksum
FROM (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')) AS token
        FROM documents WHERE {_sql_md5_mod("doc_id", 10)} = 0)
  GROUP BY token
)
UNION ALL
SELECT 'monsterQuery' AS job, CAST(count(*) AS BIGINT) AS records,
       CAST(sum(('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 8))::BIGINT)
            AS BIGINT) AS checksum
FROM (
  WITH s0 AS (SELECT l_orderkey AS k, CAST(l_quantity * 100 AS BIGINT) AS v FROM lineitem),
  s1 AS (SELECT k, v FROM (
           SELECT k // 5 AS k, CAST(sum(v) AS BIGINT) AS v FROM s0
           WHERE {_sql_md5_mod("'1:' || k", 10)} = 0 GROUP BY 1)
         WHERE {_sql_md5_mod("'1r:' || k", 5)} < 2),
  s2 AS (SELECT k, v FROM (
           SELECT k // 5 AS k, CAST(sum(v) AS BIGINT) AS v FROM s1
           WHERE {_sql_md5_mod("'2:' || k", 10)} = 0 GROUP BY 1)
         WHERE {_sql_md5_mod("'2r:' || k", 5)} < 2),
  s3 AS (SELECT k, v FROM (
           SELECT k // 5 AS k, CAST(sum(v) AS BIGINT) AS v FROM s2
           WHERE {_sql_md5_mod("'3:' || k", 10)} = 0 GROUP BY 1)
         WHERE {_sql_md5_mod("'3r:' || k", 5)} < 2)
  SELECT k, v FROM s3
)
UNION ALL
{_mini_sort_oracle("webdataSort", 7)}
""",
)
def gridmix2_mini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gridmix2 mini-mix: one small-size job per class, the mix's stage
    structure at driver scale — three validated variable-key sorts
    (streamSort/javaSort/webdataSort at key widths 5/3/7), the 0.2%
    webdataScan select, the combiner-heavy wordcount, and monsterQuery's
    three CHAINED keep-10%/keep-40% stages (GridMixRunner.java:237-276
    chains them through JobControl; here the chain is lazy plan
    composition and Catalyst schedules the whole mix as one DAG). One
    summary row per job: (job, records, checksum)."""
    from concurrent.futures import ThreadPoolExecutor

    from hadoop_1_spark.operators.sampling import md5_mod

    # r15 (guide §2.6 applied to PLAN CONSTRUCTION): the three sort-class
    # branches are independent and their builders are py4j-chatter-bound
    # (~0.4 s of driver round-trips each — tokenize/slice/sort/validate
    # column chains); building them on a small pool overlaps the
    # round-trip latency (py4j is thread-safe; no Spark job runs here,
    # plan construction only). Branch order in the union is fixed by the
    # futures list, so the result is byte-identical.
    with ThreadPoolExecutor(max_workers=3) as pool:
        sort_rows = list(
            pool.map(
                lambda jw: _mini_sort_row(spark, sf_dir, jw[0], jw[1]),
                [("streamSort", 5), ("javaSort", 3), ("webdataSort", 7)],
            )
        )
    rows = [sort_rows[0], sort_rows[1]]
    li = _load(spark, sf_dir, "lineitem")
    chk32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")  # noqa: E731
    scan_key = F.concat_ws(
        ":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    rows.append(
        li.where(md5_mod(scan_key, 500) == 0).agg(
            F.lit("webdataScan").alias("job"),
            F.count("*").cast("long").alias("records"),
            F.sum(chk32(F.col("l_orderkey").cast("string"))).cast("long").alias("checksum"),
        )
    )
    from hadoop_1_spark.operators.textops import ws_tokens

    docs = _load(spark, sf_dir, "documents")
    wc = (
        docs.where(md5_mod(F.col("doc_id"), 10) == 0)
        .select(F.explode(ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    rows.append(
        wc.agg(
            F.lit("combiner").alias("job"),
            F.count("*").cast("long").alias("records"),
            F.sum(chk32(F.concat_ws(":", F.col("token"), F.col("cnt").cast("string"))))
            .cast("long")
            .alias("checksum"),
        )
    )
    mq = li.select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_quantity") * 100).cast("long").alias("v"),
    )
    for i in (1, 2, 3):
        mq = (
            mq.where(md5_mod(F.concat(F.lit(f"{i}:"), F.col("k").cast("string")), 10) == 0)
            .groupBy(F.expr("k div 5").alias("k"))
            .agg(F.sum("v").cast("long").alias("v"))
            .where(md5_mod(F.concat(F.lit(f"{i}r:"), F.col("k").cast("string")), 5) < 2)
        )
    rows.append(
        mq.agg(
            F.lit("monsterQuery").alias("job"),
            F.count("*").cast("long").alias("records"),
            F.sum(chk32(F.concat_ws(":", F.col("k").cast("string"), F.col("v").cast("string"))))
            .cast("long")
            .alias("checksum"),
        )
    )
    rows.append(sort_rows[2])
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
