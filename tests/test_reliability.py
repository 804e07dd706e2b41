"""SkipBadRecords / Counters / JobControl parity + Record I/O schema
round-trips (SURVEY.md §1.2b, §1.4, §2.3 P8, §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_1_spark.operators import reliability


def test_skip_bad_records_side_output(spark):
    df = spark.createDataFrame([("1",), ("2",), ("boom",), ("4",)], "x string")

    def parse(v: str) -> str:
        return str(int(v) * 10)

    out = reliability.skip_bad_records(df, parse, "x")
    good = {r["x"]: r["out"] for r in out.where("_error is null").collect()}
    bad = {r["x"]: r["_error"] for r in out.where("_error is not null").collect()}
    assert good == {"1": "10", "2": "20", "4": "40"}
    assert list(bad) == ["boom"] and bad["boom"].startswith("ValueError")


def test_counters_observe(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    observed, obs = reliability.with_counters(
        df,
        records=F.count(F.lit(1)),
        odd=F.sum(F.expr("if(v % 2 = 1, 1, 0)")),
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["records"] == 100 and got["odd"] == 50


def test_jobcontrol_dependency_order(spark, tmp_path):
    order: list[str] = []
    jc = reliability.JobControl()
    jc.add_job("c", lambda: order.append("c"), depends_on=("a", "b"))
    jc.add_job("a", lambda: order.append("a"))
    jc.add_job("b", lambda: order.append("b"), depends_on=("a",))
    jc.run()
    assert order == ["a", "b", "c"]


def test_jobcontrol_cycle_raises():
    import graphlib

    jc = reliability.JobControl()
    jc.add_job("a", lambda: None, depends_on=("b",))
    jc.add_job("b", lambda: None, depends_on=("a",))
    with pytest.raises(graphlib.CycleError):
        jc.run()


def test_record_io_nested_schema_roundtrip(spark, tmp_path):
    """Record I/O DDL parity (src/test/ddl/test.jr RecRecord1): all scalars
    + vector<ustring> + map<ustring,ustring> + nested record, written and
    read back through parquet with schema intact (§1.2b: StructType/
    ArrayType/MapType are the 1:1 mapping)."""
    schema = (
        "rbool boolean, rbyte tinyint, rint int, rlong bigint, rfloat float, "
        "rdouble double, rustring string, rbuffer binary, "
        "rvec array<string>, rmap map<string,string>, "
        "rnested struct<inner_int: int, inner_vec: array<array<string>>>"
    )
    rows = [
        (
            True, 1, 2, 3, 1.5, 2.5, "s", b"\x01\x02",
            ["a", "b"], {"k": "v"}, (7, [["x"], ["y", "z"]]),
        )
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "rec")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema == df.schema
    r = back.collect()[0]
    assert r["rmap"] == {"k": "v"} and r["rnested"]["inner_vec"] == [["x"], ["y", "z"]]
    # CSV wire format (record/CsvRecordInput.java): scalars round-trip
    csv_path = str(tmp_path / "rec_csv")
    df.select("rint", "rustring", "rdouble").write.option("header", True).csv(csv_path)
    csv_back = (
        spark.read.option("header", True)
        .schema("rint int, rustring string, rdouble double")
        .csv(csv_path)
    )
    assert csv_back.collect()[0]["rdouble"] == 2.5
