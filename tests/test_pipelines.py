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


@pytest.mark.parametrize("name", ["distch_plan", "xml_records", "wordcount_salted"])
def test_pipeline_extras_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_salted_aggregate_equals_direct(spark):
    from pyspark.sql import functions as F

    from hadoop_1_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(300)], "id long, key string"
    )
    direct = {(r["key"], r["cnt"]) for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    salted = {
        (r["key"], r["cnt"])
        for r in salted_aggregate(
            df, "key", 8, F.col("id"), [("cnt", lambda c: F.count("*"), lambda c: F.sum(c))]
        ).collect()
    }
    assert salted == direct


def test_har_style_compaction(spark, tmp_path):
    """HAR archive intent (HadoopArchives.java:77): many small files ->
    few larger ones via coalesce + rewrite."""
    import os

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    spark.range(0, 1000).repartition(50).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    spark.read.parquet(src).coalesce(2).write.parquet(dst)
    n_big = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_small == 50 and n_big == 2
    assert spark.read.parquet(dst).count() == 1000


def test_apply_index_ops_latest_wins(spark):
    """DocumentAndOp sequences: the highest-seq opdecides a doc's fate —
    update-then-delete removes, delete-then-insert resurrects, untouched
    docs pass through, new INSERTs appear."""
    from hadoop_1_spark import pipelines

    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
    )
    ops = spark.createDataFrame(
        [
            (1, "UPDATE", "one-v2", 1),
            (1, "DELETE", None, 2),
            (2, "DELETE", None, 1),
            (2, "INSERT", "two-v2", 2),
            (9, "INSERT", "nine", 1),
        ],
        "doc_id long, op string, text string, seq long",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in pipelines.apply_index_ops(base, ops).collect()
    }
    assert got == {2: "two-v2", 3: "three", 9: "nine"}
