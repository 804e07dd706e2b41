"""FieldSelection spec compiler + sampling filters vs oracle and unit cases."""

import pytest

from hadoop_1_spark.operators.fieldsel import field_selection, parse_field_spec
from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize(
    "name", ["fieldsel", "sample_percent", "sample_md5", "sample_regex"]
)
def test_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_parse_field_spec():
    assert parse_field_spec("4,3,0-") == ([4, 3], 0)
    assert parse_field_spec("2-4") == ([2, 3, 4], None)
    assert parse_field_spec("-2") == ([0, 1, 2], None)
    assert parse_field_spec("1,,5") == ([1, 5], None)
    assert parse_field_spec("3-") == ([], 3)


def test_field_selection_short_records(spark):
    """Reference keeps the separator slot for enumerated fields beyond the
    record length (FieldSelectionHelper.selectFields:116-124)."""
    df = spark.createDataFrame([("a-b",), ("a-b-c-d-e-f",)], "line string")
    out = field_selection(df, "4,3,0-:1,2", separator="-").collect()
    got = {r["key"]: r["value"] for r in out}
    # short record: f4="" f3="" then all from 0 -> "--a-b"; value f1,f2 -> "b-"
    assert got["--a-b"] == "b-"
    assert got["e-d-a-b-c-d-e-f"] == "b-c"
