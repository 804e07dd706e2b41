"""Projection / filter / per-record transform queries (SURVEY.md §2.3).

Reference parity: Grep.java, WordCount.java, TokenCountMapper, RegexMapper,
InverseMapper, MultiFileWordCount (same aggregation over many files).
Corpus: ``documents.text`` stands in for the reference's text-line inputs
(FIXTURES.md F1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import transforms
from hadoop_1_spark.registry import _load, register

# Flagship grep pattern: words starting with "s" (scan -> regex explode ->
# group-count -> global sort desc; exercises the whole Phase-0 slice).
GREP_PATTERN = r"s\w+"

_WORDCOUNT_ORACLE = """
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
"""


@register(
    "wordcount",
    oracle=_WORDCOUNT_ORACLE,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount (examples/WordCount.java:17): tokenize + count.

    Catalyst's partial aggregation = the reference's combiner; no explicit
    combiner needed. At 100 TB this is a map-side-combined single shuffle on
    the token key."""
    docs = _load(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    return transforms.token_count(docs)


@register(
    "grep",
    oracle=f"""
SELECT match, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(regexp_extract_all(text, '{GREP_PATTERN}')) AS match
  FROM documents
)
GROUP BY match
ORDER BY cnt DESC, match ASC
""",
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep pipeline (examples/Grep.java:34): regex match -> count -> sort
    desc. The reference runs two MR jobs (count, then 1-reducer sort); one
    declarative plan here."""
    docs = _load(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    return transforms.grep(docs, GREP_PATTERN)


@register(
    "inverse_kv",
    oracle="""
SELECT CAST(n_name AS VARCHAR) AS key, CAST(n_nationkey AS VARCHAR) AS value
FROM nation
""",
)
def inverse_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InverseMapper (mapred/lib/InverseMapper.java:30): (k,v) -> (v,k) on a
    kv projection of nation."""
    kv = _load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("key"),
        F.col("n_name").cast("string").alias("value"),
    )
    return transforms.inverse(kv)
