"""Domain pipelines (pipelines.py) vs DuckDB oracle + unit checks."""

from __future__ import annotations

import pytest

from hadoop_1_spark import pipelines
from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize(
    "name",
    ["index_build", "logalyzer_grep_sort", "rumen_cdf", "distcp_manifest_diff"],
)
def test_pipeline_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_inverted_index_postings_sorted(spark):
    df = spark.createDataFrame(
        [(2, "b a b"), (1, "a b a")], "doc_id long, text string"
    )
    rows = {r["term"]: r for r in pipelines.inverted_index(df).collect()}
    assert rows["a"]["postings"] == "1:2,2:1"
    assert rows["b"]["postings"] == "1:1,2:2"
    assert rows["a"]["df"] == 2 and rows["a"]["total_tf"] == 3


def test_distcp_plan_actions(spark):
    src = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "path string, size long")
    dst = spark.createDataFrame([("b", 2), ("c", 9), ("d", 4)], "path string, size long")
    plan = {r["path"]: r["action"] for r in pipelines.distcp_plan(src, dst).collect()}
    assert plan == {"a": "copy", "b": "skip", "c": "update", "d": "delete"}
    no_del = {r["path"]: r["action"] for r in pipelines.distcp_plan(src, dst, delete=False).collect()}
    assert "d" not in no_del
