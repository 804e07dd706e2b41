"""Per-record transforms: the reference's mapper library.

Reference parity (cites are /root/reference paths):
- IdentityMapper/IdentityReducer  src/mapred/org/apache/hadoop/mapred/lib/IdentityMapper.java:30
- InverseMapper                   src/mapred/org/apache/hadoop/mapred/lib/InverseMapper.java:30
- RegexMapper                     src/mapred/org/apache/hadoop/mapred/lib/RegexMapper.java:35
- TokenCountMapper                src/mapred/org/apache/hadoop/mapred/lib/TokenCountMapper.java:35
- Grep pipeline                   src/examples/org/apache/hadoop/examples/Grep.java:34
- ChainMapper/ChainReducer        src/mapred/org/apache/hadoop/mapred/lib/ChainMapper.java:122

All are narrow (no shuffle) except the count/sort tails, which Catalyst
executes with map-side partial aggregation — the automatic equivalent of the
reference's combiner (src/mapred/org/apache/hadoop/mapred/Task.java:1360).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokenization, as StringTokenizer does in WordCount.java:25.
TOKEN_SPLIT_RE = r"\s+"


def identity(df: DataFrame) -> DataFrame:
    """IdentityMapper/IdentityReducer: pass-through (used in the reference to
    get shuffle+sort only; in Spark, sorting is explicit — see sort.py)."""
    return df


def inverse(df: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """InverseMapper: (k, v) -> (v, k)."""
    return df.select(F.col(value).alias(key), F.col(key).alias(value))


def tokens(line: Column, pattern: str = TOKEN_SPLIT_RE) -> Column:
    """Split a line into a token array, dropping empty tokens (StringTokenizer
    semantics: leading/trailing/repeated whitespace yields no empty tokens)."""
    return F.filter(F.split(F.trim(line), pattern), lambda t: t != F.lit(""))


def token_count(df: DataFrame, column: str = "line") -> DataFrame:
    """TokenCountMapper + LongSumReducer = WordCount: (token, count)."""
    return (
        df.select(F.explode(tokens(F.col(column))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def regex_mapper(df: DataFrame, pattern: str, group: int = 0, column: str = "line") -> DataFrame:
    """RegexMapper: emit (match-group, 1) for every regex match in the value
    (config keys mapred.mapper.regex / mapred.mapper.regex.group), summed."""
    matches = F.regexp_extract_all(F.col(column), F.lit(pattern), group)
    return (
        df.select(F.explode(matches).alias("match"))
        .groupBy("match")
        .agg(F.count("*").alias("cnt"))
    )


def grep(df: DataFrame, pattern: str, group: int = 0, column: str = "line") -> DataFrame:
    """The Grep example pipeline (two chained MR jobs in the reference:
    RegexMapper+LongSumReducer, then InverseMapper+IdentityReducer with a
    single reducer for the descending sort). One declarative plan here —
    Catalyst runs partial aggregation map-side and a final ordered exchange,
    which is exactly the reference's combiner + 1-reducer sort."""
    return regex_mapper(df, pattern, group, column).orderBy(
        F.desc("cnt"), F.asc("match")
    )


def chain(df: DataFrame, *stages: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """ChainMapper/ChainReducer ([MAP+ / REDUCE MAP*]): compose stages inside
    one job. Spark pipelines narrow stages into one whole-stage-codegen span
    automatically, so this is plain function composition."""
    for stage in stages:
        df = df.transform(stage)
    return df
