"""External-process UDF surface (pipes.py) vs oracle + unit checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_1_spark.operators import pipes
from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize(
    "name", ["pipe_wordcount", "pipe_upper_kv", "udaf_builtins", "udaf_pandas_median"]
)
def test_udf_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_pipe_lines_udtf_semantics(spark):
    """A mapper may emit 0..n lines per input (here: cat = identity)."""
    df = spark.createDataFrame([("a b",), ("c",)], "text string")
    got = sorted(r["line"] for r in pipes.pipe_lines(df, "cat").collect())
    assert got == ["a b", "c"]


def test_pipe_kv_first_tab_contract(spark):
    df = spark.createDataFrame([("k1", "v1\tv2"), ("k2", "")], "key string, value string")
    out = {r["key"]: r["value"] for r in pipes.pipe_kv(df, "cat").collect()}
    assert out == {"k1": "v1\tv2", "k2": ""}


def test_subprocess_map_batches_multiline(spark):
    df = spark.createDataFrame([(i, f"w{i}") for i in range(50)], "id long, w string").repartition(4)
    out = pipes.subprocess_map_batches(df, ["tr", "a-z", "A-Z"])
    rows = sorted(r["line"] for r in out.collect())
    assert len(rows) == 50
    assert rows[0].endswith("W0")


def test_udaf_registry_plugin():
    pipes.register_udaf("MyCount", lambda c: F.count(c))
    assert "MyCount" in pipes.UDAF_REGISTRY
    del pipes.UDAF_REGISTRY["MyCount"]


def test_subprocess_typedbytes_identity(spark):
    """-io typedbytes through a real process (cat): binary framing survives
    values that would break text framing (tabs/newlines in data)."""
    df = spark.createDataFrame(
        [("k1", "v with\ttab"), ("k2", "v with\nnewline")], "k string, v string"
    )
    out = {r["key"]: r["value"] for r in pipes.subprocess_map_typedbytes(df, ["cat"]).collect()}
    assert out == {"k1": "v with\ttab", "k2": "v with\nnewline"}


def test_variant_props_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "variant_props_stats")


def test_udtf_tag_spans_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "udtf_tag_spans")


def test_pipe_typedbytes_kv_matches_oracle(spark, duck):
    """End-to-end -io typedbytes leg: engine encoder -> independent
    struct-level script decoder/encoder -> engine decoder, hash-checked."""
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "pipe_typedbytes_kv")
