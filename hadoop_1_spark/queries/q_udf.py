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


@register(
    "variant_props_stats",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events WHERE props IS NOT NULL
GROUP BY 1
""",
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface via Spark 4's VARIANT type: props parses
    once to a variant column (binary semi-structured encoding — the
    scale path for ragged JSON, no per-query re-tokenization) and the
    typed path extraction feeds exact integer aggregation. The oracle
    reads the same field with DuckDB's JSON extraction — two different
    semi-structured engines, one hash-checked answer."""
    ev = _load(spark, sf_dir, "events").where(F.col("props").isNotNull())
    v = ev.select(
        "event_type", F.try_parse_json("props").alias("_v")
    ).select(
        "event_type",
        F.try_variant_get("_v", "$.k", "bigint").alias("_k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_k").cast("bigint").alias("sum_k"),
        F.min("_k").cast("bigint").alias("min_k"),
        F.max("_k").cast("bigint").alias("max_k"),
    )


@register(
    "udtf_tag_spans",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE doc_id < 50 AND text IS NOT NULL
)
SELECT doc_id,
       CAST(i AS INT) AS pos,
       toks[i] AS token,
       CAST(length(toks[i]) AS INT) AS tok_len
FROM t, unnest(range(1, len(toks) + 1)) u(i)
WHERE i <= 8
""",
)
def udtf_tag_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4's table-function API — the remaining
    member of the UDF family beside pipes, pandas UDAFs, and Arrow
    batch maps): a generator UDTF emits (pos, token, tok_len) rows for
    each document's first 8 tokens. Deliberately bounded to 50 docs —
    UDTFs are row-at-a-time Python, the SLOW path kept for API parity
    (the same logic in exprs is posexplode + length); the plan-lint
    exemption is the bound. Output hash-matches the declarative
    oracle."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, token string, tok_len int", useArrow=True)
    class TagSpans:
        def eval(self, text: str, limit: int):
            if text is None:
                return
            toks = [t for t in text.strip().split() if t]
            for i, tok in enumerate(toks[: int(limit)], start=1):
                yield i, tok, len(tok)

    docs = _load(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 50) & F.col("text").isNotNull()
    )
    spans = docs.lateralJoin(
        TagSpans(F.col("text").outer(), lit(8).outer())
    )
    return spans.select(
        "doc_id", F.col("pos"), F.col("token"), F.col("tok_len")
    )


@register(
    "pipe_typedbytes_kv",
    oracle="""
SELECT upper(source) AS key,
       CAST(count(*) AS BIGINT) AS n,
       min(CAST(doc_id AS VARCHAR)) AS min_doc
FROM documents
GROUP BY 1
""",
)
def pipe_typedbytes_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`-io typedbytes` end-to-end (round-5 verdict #6): (doc_id, source)
    rows framed as typedbytes VECTOR records into an external script that
    speaks the wire format with its OWN struct-level implementation
    (ext/tb_upper_kv.py — no shared code with the engine codec), whose
    typedbytes output is decoded back with the streaming (key, value)
    contract; reduce = Catalyst count/min. Any framing asymmetry breaks
    the oracle hash. Reference: contrib/streaming typedbytes
    Type.java:27-37, TypedBytesOutputReader."""
    import sys

    from hadoop_1_spark.ext import asset_path

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source")
    kv = pipes.subprocess_map_typedbytes(
        docs, [sys.executable, asset_path("tb_upper_kv.py")]
    )
    return kv.groupBy(F.col("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.min("value").alias("min_doc"),
    )
