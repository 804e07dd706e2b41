"""Record I/O queries: the .jr-compiled record codec exercised end-to-end
over driver tables (SURVEY.md §1.2b; reference src/core/org/apache/hadoop/
record/compiler + CsvRecordOutput/BinaryRecordOutput runtime).

The round-trip query builds a record value per orders row, pushes it
through BOTH wire codecs (CSV encode -> decode, binary encode -> decode),
and projects the output columns from the DECODED values — so the oracle,
which computes the same projections straight from the table, hash-verifies
that encode∘decode is the identity on real data (strings with every
escaped character class, negative bytes, exact-fraction floats, vectors,
maps, nested records)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.registry import _load, register
from hadoop_1_spark.sources import recordio

# The Flat record shape from tests/fixtures/records.jr, inlined so the
# query is self-contained (same type coverage as the reference's
# src/test/ddl/test.jr RecRecord1).
_FLAT_JR = """
module engine.q {
    class Leaf { ustring stringVal; }
    class Flat {
        boolean boolVal;
        byte byteVal;
        int intVal;
        long longVal;
        float floatVal;
        double doubleVal;
        ustring stringVal;
        buffer bufferVal;
        vector<ustring> vectorVal;
        map<ustring, ustring> mapVal;
        Leaf recordVal;
    }
}
"""

_FLAT = recordio.parse_jr(_FLAT_JR)["engine.q.Flat"]

_OUT_SCHEMA = (
    "o_orderkey bigint, flag boolean, byte_val int, cust int, "
    "str_rt string, buf_hex string, vec_n int, vec_first string, "
    "map_p string, leaf string, csv_ok boolean, bin_ok boolean"
)


@register(
    "recordio_roundtrip",
    oracle="""
SELECT o_orderkey,
       (o_orderkey % 2 = 0) AS flag,
       CAST(o_orderkey % 100 - 50 AS INT) AS byte_val,
       CAST(o_custkey % 100000 AS INT) AS cust,
       o_orderstatus || ',' || o_orderpriority || '}%' || chr(10) AS str_rt,
       upper(hex(encode(o_orderpriority))) AS buf_hex,
       CAST(len(string_split(o_orderpriority, '-')) AS INT) AS vec_n,
       string_split(o_orderpriority, '-')[1] AS vec_first,
       o_orderpriority AS map_p,
       o_orderstatus AS leaf,
       TRUE AS csv_ok,
       TRUE AS bin_ok
FROM orders WHERE o_orderkey % 100 = 0
""",
)
def recordio_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip every orders row (orderkey % 100 sample) through the
    .jr-compiled Flat record's CSV and binary codecs inside one
    Arrow-batched mapInPandas pass; all output columns derive from the
    DECODED record, plus csv_ok/bin_ok asserting decoded == original —
    the oracle recomputes the projections directly, so any codec
    asymmetry (escaping, vlong framing, nesting) hash-mismatches."""
    import pandas as pd

    schema = _FLAT

    def roundtrip(batches):
        for pdf in batches:
            out = {k: [] for k in [
                "o_orderkey", "flag", "byte_val", "cust", "str_rt",
                "buf_hex", "vec_n", "vec_first", "map_p", "leaf",
                "csv_ok", "bin_ok",
            ]}
            for ok, ck, st, pr in zip(
                pdf["o_orderkey"], pdf["o_custkey"],
                pdf["o_orderstatus"], pdf["o_orderpriority"],
            ):
                ok, ck = int(ok), int(ck)
                val = (
                    ok % 2 == 0,
                    ok % 100 - 50,
                    ck % 100000,
                    ok,
                    (ok % 16) / 4.0,          # exact binary fraction
                    float(ok) + 0.5,          # exact in double
                    f"{st},{pr}}}%\n",        # comma, rbrace, percent, LF
                    pr.encode("utf-8"),
                    pr.split("-"),
                    {"p": pr, "s": st},
                    (st,),
                )
                c = recordio.csv_decode(recordio.csv_encode(val, schema), schema)
                b = recordio.binary_decode(
                    recordio.binary_encode(val, schema), schema
                )
                out["o_orderkey"].append(c[3])
                out["flag"].append(c[0])
                out["byte_val"].append(c[1])
                out["cust"].append(c[2])
                out["str_rt"].append(c[6])
                out["buf_hex"].append(c[7].hex().upper())
                out["vec_n"].append(len(c[8]))
                out["vec_first"].append(c[8][0])
                out["map_p"].append(c[9]["p"])
                out["leaf"].append(c[10][0])
                out["csv_ok"].append(c == val)
                out["bin_ok"].append(b == val)
            yield pd.DataFrame(out)

    src = (
        _load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )
    return src.mapInPandas(roundtrip, schema=_OUT_SCHEMA)
