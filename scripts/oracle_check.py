"""Local replica of the driver's correctness gate: run a registered query
on Spark AND its DuckDB oracle SQL at sf0.01, compare row count, column
names, and exact values (columns sorted by name, rows sorted by all
columns) — the same strictness as the driver's value-hash.

Usage: python scripts/oracle_check.py [query ...]   (default: all oracles)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from hadoop_1_spark import registry  # noqa: E402
from hadoop_1_spark.session import TABLES, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _canon(v):
    # Type-tagged so rows containing NULLs still sort (None has no <).
    if v is None:
        return ("n",)
    if isinstance(v, float):
        return ("f", struct_pack(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("v", v)


def struct_pack(v: float) -> bytes:
    import struct

    if math.isnan(v):
        return b"nan"
    return struct.pack("<d", v)


def check(name: str, spark, con) -> bool:
    try:
        sdf = registry.QUERIES[name](spark, SF_DIR)
        spark_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # keep sweeping; an exception is a hard FAIL
        first = str(e).splitlines()[0] if str(e) else type(e).__name__
        print(f"{name}: FAIL (exception: {first[:200]})")
        return False
    spark_cols = list(sdf.columns)
    odf = con.sql(registry.ORACLE[name])
    oracle_cols = list(odf.columns)
    oracle_rows = [tuple(r) for r in odf.fetchall()]
    ok = True
    if sorted(spark_cols) != sorted(oracle_cols):
        print(f"  {name}: SCHEMA mismatch {sorted(spark_cols)} vs {sorted(oracle_cols)}")
        ok = False
    if len(spark_rows) != len(oracle_rows):
        print(f"  {name}: ROWS mismatch {len(spark_rows)} vs {len(oracle_rows)}")
        ok = False
    if ok:
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_ix = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        s = sorted(tuple(_canon(r[i]) for i in s_ix) for r in spark_rows)
        o = sorted(tuple(_canon(r[i]) for i in o_ix) for r in oracle_rows)
        if s != o:
            bad = next(i for i, (x, y) in enumerate(zip(s, o)) if x != y)
            print(f"  {name}: VALUE mismatch at sorted row {bad}:")
            print(f"    spark : {s[bad]}")
            print(f"    oracle: {o[bad]}")
            ok = False
    status = "ok" if ok else "FAIL"
    print(f"{name}: {status} ({len(spark_rows)} rows)")
    return ok


def main() -> None:
    names = sys.argv[1:] or sorted(registry.ORACLE)
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    failures = [n for n in names if n in registry.ORACLE and not check(n, spark, con)]
    missing = [n for n in names if n not in registry.ORACLE]
    if missing:
        print("no oracle:", ", ".join(missing))
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print(f"all {len(names) - len(missing)} checked queries green")


if __name__ == "__main__":
    main()
