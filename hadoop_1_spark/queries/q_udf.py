"""UDF-surface queries (SURVEY.md §2.10): external-script mappers via
rdd.pipe and Arrow-batched subprocess, plus the named-UDAF registry
(built-ins and a pandas GROUPED_AGG plugin).

The pipe queries run real executables (`tr`) — streaming-API parity with
examples like `-mapper 'tr ...'` — and are still oracle-checked because
the scripts compute engine-expressible transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import pipes
from hadoop_1_spark.registry import _load, register


@register(
    "pipe_wordcount",
    oracle="""
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
""",
)
def pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming wordcount: -mapper 'tr -s \" \" \"\\n\"' (an external
    process tokenizer via rdd.pipe), reduce = Catalyst count."""
    docs = _load(spark, sf_dir, "documents").select("text")
    tokens = pipes.pipe_lines(docs, r"tr -s ' ' '\n'", output_col="token")
    return (
        tokens.where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


@register(
    "pipe_upper_kv",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS key, upper(source) AS value FROM documents
""",
)
def pipe_upper_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched external mapper: doc_id\\tsource lines through
    `tr a-z A-Z` (one fork per Arrow batch), parsed back with the
    streaming first-tab key/value contract."""
    docs = _load(spark, sf_dir, "documents").select("doc_id", "source")
    out = pipes.subprocess_map_batches(docs, ["tr", "a-z", "A-Z"])
    return out.select(
        F.substring_index("line", "\t", 1).alias("key"),
        F.substring_index("line", "\t", -1).alias("value"),
    )


@register(
    "udaf_builtins",
    oracle="""
SELECT event_type,
       CAST(sum(user_id) AS BIGINT) AS LongValueSum,
       min(user_id) AS LongValueMin,
       max(user_id) AS LongValueMax,
       CAST(count(DISTINCT user_id) AS BIGINT) AS UniqValueCount
FROM events GROUP BY event_type
""",
)
def udaf_builtins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry-dispatched built-in aggregators by name (the
    aggregator.descriptor.* selection mechanism)."""
    ev = _load(spark, sf_dir, "events")
    return pipes.grouped_aggregate(
        ev, "event_type", "user_id",
        ["LongValueSum", "LongValueMin", "LongValueMax", "UniqValueCount"],
    )


@register(
    "udaf_pandas_median",
    oracle="""
SELECT event_type, round(median(value), 6) AS median_value
FROM events GROUP BY event_type
""",
)
def udaf_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pandas GROUPED_AGG plugin from the registry (arbitrary-Python
    UDAF), oracle-checked against DuckDB's median."""
    ev = _load(spark, sf_dir, "events")
    out = pipes.grouped_aggregate(ev, "event_type", "value", ["PandasMedian"])
    return out.select(
        "event_type", F.round(F.col("PandasMedian"), 6).alias("median_value")
    )
