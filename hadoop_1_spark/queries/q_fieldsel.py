"""FieldSelection (P5) + sampling-scan (S7) queries.

Fixture F3: the multi-field delimited line is built from string-cast lineitem
columns joined with "-" (mirrors TestFieldSelection.java's 6 dash-separated
fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import fieldsel, sampling
from hadoop_1_spark.registry import _load, register

# Six string fields from lineitem, like the reference test's f0..f5.
_LINE_COLS = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity", "l_partkey"]
FIELD_SPEC = "4,3,0-:1,2"  # key = f4,f3,f0..f5 ; value = f1,f2


def _lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return li.select(
        F.concat_ws("-", *[F.col(c).cast("string") for c in _LINE_COLS]).alias("line")
    )


@register(
    "fieldsel",
    oracle="""
WITH f AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS f0, CAST(l_linenumber AS VARCHAR) AS f1,
         l_returnflag AS f2, l_linestatus AS f3,
         CAST(l_quantity AS VARCHAR) AS f4, CAST(l_partkey AS VARCHAR) AS f5
  FROM lineitem
)
SELECT concat_ws('-', f4, f3, f0, f1, f2, f3, f4, f5) AS key,
       concat_ws('-', f1, f2) AS value
FROM f
""",
)
def fieldsel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FieldSelectionMapReduce with spec "4,3,0-:1,2" over '-'-separated
    6-field lines (mapred/lib/FieldSelectionMapReduce.java:36; golden shape of
    src/test/.../TestFieldSelection.java)."""
    return fieldsel_lines(_lines(spark, sf_dir))


def fieldsel_lines(lines: DataFrame) -> DataFrame:
    return fieldsel.field_selection(lines, FIELD_SPEC, separator="-")


@register(
    "sample_percent",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders WHERE o_orderkey % 10 = 0
""",
)
def sample_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PercentFilter (SequenceFileInputFilter.java:81): deterministic keep of
    ~1/10 of records keyed on o_orderkey. The filter is pushed down to the
    parquet scan (predicate pushdown — check .explain PushedFilters)."""
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return sampling.percent_filter(orders, "o_orderkey", 10)


@register(
    "sample_md5",
    oracle="""
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 8, 1) = '0'
""",
)
def sample_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5Filter: md5-bucketed deterministic 1/16 sample (digest mod 16 == 0
    ⟺ 8th hex char of the first 8 == '0' — portable across engines)."""
    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.md5_filter(docs, "doc_id", 16)


@register(
    "sample_regex",
    oracle="""
SELECT doc_id, source FROM documents
WHERE regexp_matches(text, 'vector.*vector')
""",
)
def sample_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RegexFilter: keep records whose key/text matches a regex."""
    docs = _load(spark, sf_dir, "documents")
    return sampling.regex_filter(docs, "text", "vector.*vector").select("doc_id", "source")
