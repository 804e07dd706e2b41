"""Gridmix-shaped benchmark queries vs DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize("name", ["gridmix_three_stage", "gridmix_reference_select"])
def test_gridmix_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_reference_select_is_selective(spark):
    from hadoop_1_spark import registry
    from hadoop_1_spark.session import load_table

    sf = "/root/testdata/sf0.01"
    total = load_table(spark, sf, "lineitem").count()
    out = registry.QUERIES["gridmix_reference_select"](spark, sf)
    # ~0.2% of rows survive the scan filter; the aggregate output is tiny
    kept = out.groupBy().sum("cnt").collect()[0][0]
    assert kept < total * 0.01
