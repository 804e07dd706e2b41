"""Transform-family queries vs the DuckDB oracle (style-3 golden tests of
the reference, with a live oracle — SURVEY.md §5)."""

import pytest

from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize("name", ["wordcount", "grep", "inverse_kv"])
def test_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert df.columns == ["match", "cnt"]


def test_chain_compose(spark):
    from pyspark.sql import functions as F

    from hadoop_1_spark.operators.transforms import chain

    df = spark.range(10)
    out = chain(
        df,
        lambda d: d.withColumn("x", F.col("id") * 2),
        lambda d: d.filter(F.col("x") > 4),
    )
    assert out.count() == 7
