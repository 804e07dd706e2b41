"""Record I/O: .jr DDL compiler + CSV/binary codecs (SURVEY.md §1.2b).

Parity targets: rcc.jj grammar (src/core/org/apache/hadoop/record/
compiler/generated/rcc.jj:153-176), CsvRecordOutput.java framing,
WritableUtils.writeVLong zero-compressed ints. The fixture
tests/fixtures/records.jr covers every construct the reference's
src/test/ddl/test.jr exercises (scalars, buffer, vector, map, nested
record, vector-of-vector-of-record, comments, include).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from hadoop_1_spark.sources import recordio

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "records.jr")


@pytest.fixture(scope="module")
def schemas():
    return recordio.load_jr(FIX)


def test_jr_parses_all_records(schemas):
    assert set(schemas) == {
        "engine.test.inc.Leaf",
        "engine.test.Flat",
        "engine.test.Deep",
    }


def test_jr_flat_field_types(schemas):
    flat = schemas["engine.test.Flat"]
    assert [f.name for f in flat.fields] == [
        "boolVal", "byteVal", "intVal", "longVal", "floatVal",
        "doubleVal", "stringVal", "bufferVal", "vectorVal", "mapVal",
        "recordVal",
    ]
    types = {f.name: f.dataType for f in flat.fields}
    assert types["boolVal"] == BooleanType()
    assert types["byteVal"] == ByteType()
    assert types["intVal"] == IntegerType()
    assert types["longVal"] == LongType()
    assert types["floatVal"] == FloatType()
    assert types["doubleVal"] == DoubleType()
    assert types["stringVal"] == StringType()
    assert types["bufferVal"] == BinaryType()
    assert types["vectorVal"] == ArrayType(StringType())
    assert types["mapVal"] == MapType(StringType(), StringType())
    # cross-module ref resolved through the include
    assert isinstance(types["recordVal"], StructType)
    assert types["recordVal"].fields[0].name == "stringVal"


def test_jr_deep_nesting(schemas):
    deep = schemas["engine.test.Deep"]
    types = {f.name: f.dataType for f in deep.fields}
    leaf = schemas["engine.test.inc.Leaf"]
    assert types["svec"] == ArrayType(ArrayType(leaf))
    assert types["strvec"] == ArrayType(ArrayType(ArrayType(StringType())))
    assert types["map1"] == MapType(ByteType(), StringType())
    assert types["mvec"] == ArrayType(MapType(IntegerType(), LongType()))


FLAT_VAL = (
    True, -5, 42, 1 << 40, 0.5, 3.25,
    "a,b}c%d\ne'f",            # every escaped char class
    b"\x00\xffab",
    ["x", "", "y,z"],
    {"k1": "v1", "k2": "v,2"},
    ("leaf",),
)

DEEP_VAL = (
    "n",
    [1, -1, 127, -113, 1 << 50],
    [[("a",), ("b",)], []],
    ("inner",),
    [[["s1", "s2"], []], [["s3"]]],
    1.5,
    {-3: "neg", 7: "pos"},
    [{1: 10, 2: 20}, {}],
)


def _roundtrip_csv(schemas, name, val):
    schema = schemas[name]
    line = recordio.csv_encode(val, schema)
    assert "\n" not in line
    return recordio.csv_decode(line, schema)


def test_map_keys_sort_by_utf16_code_units():
    """Java TreeMap order for string keys: U+FFFF sorts BEFORE U+10000
    (whose surrogate-pair code units 0xD800 0xDC00 are lower), the
    opposite of Python's code-point sort (round-6 advice #2)."""
    schema = StructType([StructField("m", MapType(StringType(), StringType()))])
    val = ({"\U00010000": "astral", "￿": "bmp"},)
    # astral key first: its leading UTF-16 code unit is a 0xD800 surrogate
    enc = recordio.csv_encode(val, schema)
    assert enc.index("astral") < enc.index("bmp")
    buf = recordio.binary_encode(val, schema)
    assert buf.index(b"astral") < buf.index(b"bmp")
    # both codecs still round-trip the astral keys
    assert recordio.csv_decode(enc, schema) == val
    assert recordio.binary_decode(buf, schema) == val


def test_csv_roundtrip_flat(schemas):
    got = _roundtrip_csv(schemas, "engine.test.Flat", FLAT_VAL)
    assert got == FLAT_VAL


def test_csv_roundtrip_deep(schemas):
    got = _roundtrip_csv(schemas, "engine.test.Deep", DEEP_VAL)
    assert got == DEEP_VAL


def test_csv_wire_format_details(schemas):
    """Byte-level grammar parity with CsvRecordOutput: T/F booleans,
    '-prefixed %XX-escaped strings, #hex buffers, s{/v{/m{ framing."""
    leaf = schemas["engine.test.inc.Leaf"]
    assert recordio.csv_encode(("a,b",), leaf) == "'a%2Cb"
    flat = schemas["engine.test.Flat"]
    line = recordio.csv_encode(FLAT_VAL, flat)
    assert line.startswith("T,-5,42,1099511627776,0.5,3.25,'a%2Cb%7Dc%25d%0Ae'f,#00ff6162,")
    assert ",v{'x,',%s}," % "'y%2Cz" in line
    assert ",m{'k1,'v1,'k2,'v%2C2}," in line
    assert line.endswith("s{'leaf}")


def test_vlong_wire_parity():
    """WritableUtils.writeVLong exact bytes: one-byte range boundaries
    and multi-byte big-endian with one's-complement negatives."""
    def enc(i):
        out = bytearray()
        recordio.write_vlong(out, i)
        return bytes(out)

    assert enc(0) == b"\x00"
    assert enc(127) == b"\x7f"
    assert enc(-112) == bytes([0x90])
    assert enc(128) == bytes([0x8f, 0x80])          # -113 marker, 1 byte
    assert enc(-113) == bytes([0x87, 0x70])         # -121 marker, ~x = 112
    assert enc(1 << 16) == bytes([0x8d, 1, 0, 0])
    for v in [0, 1, -1, 127, 128, -112, -113, 255, 256, 1 << 31, -(1 << 40), (1 << 62)]:
        got, pos = recordio.read_vlong(enc(v), 0)
        assert got == v and pos == len(enc(v))


def test_binary_roundtrip(schemas):
    for name, val in [("engine.test.Flat", FLAT_VAL), ("engine.test.Deep", DEEP_VAL)]:
        schema = schemas[name]
        buf = recordio.binary_encode(val, schema)
        assert recordio.binary_decode(buf, schema) == val


def test_recordio_roundtrip_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "recordio_roundtrip")


def test_read_records_csv_spark(spark, schemas, tmp_path):
    """End-to-end: encode rows to a record-CSV file, read back through
    spark.read.text + mapInPandas into the .jr-compiled StructType."""
    schema = schemas["engine.test.Flat"]
    vals = [FLAT_VAL, (False, 0, -1, 2, 1.0, -2.5, "", b"", [], {}, ("q",))]
    p = tmp_path / "rec.csv"
    p.write_text("".join(recordio.csv_encode(v, schema) + "\n" for v in vals))
    df = recordio.read_records_csv(spark, str(p), schema)
    assert df.schema == schema
    rows = sorted(df.collect(), key=lambda r: r["intVal"])
    assert rows[0]["intVal"] == -1 and rows[0]["recordVal"]["stringVal"] == "q"
    assert rows[1]["boolVal"] is True
    assert rows[1]["mapVal"] == {"k1": "v1", "k2": "v,2"}
    assert bytes(rows[1]["bufferVal"]) == b"\x00\xffab"
    assert rows[1]["vectorVal"] == ["x", "", "y,z"]


def test_versioned_read_old_to_new():
    """RecRecordOld -> RecRecordNew evolution (src/test/ddl/test.jr):
    renamed field (name -> name2) defaults to None, retyped fields
    (vector<long> -> vector<int>, float -> int) default to None,
    compatible fields (inner record, strvec, mvec2) carry over, and the
    widened direction (vector<int> written, vector<long> read) carries."""
    old = recordio.parse_jr("""
module t {
  class Leaf { ustring s; }
  class Old {
    ustring name;
    vector<int> ivec;
    Leaf inner;
    vector<vector<vector<ustring>>> strvec;
    float i1;
    map<byte, ustring> map1;
    vector<map<int, long>> mvec2;
  }
}""")["t.Old"]
    new = recordio.parse_jr("""
module t {
  class Leaf { ustring s; }
  class New {
    ustring name2;
    Leaf inner;
    vector<long> ivec;
    vector<vector<vector<ustring>>> strvec;
    int i1;
    map<long, ustring> map1;
    vector<map<int, long>> mvec2;
  }
}""")["t.New"]
    val = ("old-name", [1, 2], ("leaf",), [[["a"]]], 1.5,
           {3: "x"}, [{7: 70}])
    buf = recordio.binary_encode(val, old)
    got = recordio.binary_decode_versioned(buf, old, new)
    assert got == (
        None,            # name2: renamed, no match
        ("leaf",),       # inner: compatible nested record
        [1, 2],          # ivec: int written, long read -> widened
        [[["a"]]],       # strvec: identical
        None,            # i1: float -> int is NOT lossless -> default
        {3: "x"},        # map1: byte -> long key widening IS lossless
        [{7: 70}],       # mvec2: identical
    )
