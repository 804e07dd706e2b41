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


def test_job5_api_variants_identical(spark):
    """Gridmix job-5 (README:66-72): the three API paths must produce the
    SAME sort — identical validator rows, is_sorted on each."""
    import os

    from hadoop_1_spark.registry import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = {
        n: QUERIES[n](spark, sf_dir).first()
        for n in (
            "gridmix_api_sort_builtin",
            "gridmix_api_sort_streaming",
            "gridmix_api_sort_pipes",
        )
    }
    base = rows["gridmix_api_sort_builtin"]
    assert base.is_sorted and base.records > 0
    for name, row in rows.items():
        assert tuple(row) == tuple(base), name
