"""TestDFSIO parity (src/test/.../fs/TestDFSIO.java:68-73,370-371):
storage throughput — "Throughput mb/sec" for write then read.

The reference writes/reads N files of a given size through HDFS and reports
MB/s; here the engine writes/reads partitioned parquet through the local
filesystem (same code path Spark uses against HDFS/S3). Usage:

    python scripts/dfsio.py [mb=256] [files=8]

Prints one JSON line {write_mb_s, read_mb_s, mb, files}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_1_spark.session import get_spark  # noqa: E402


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("dfsio")
    # ~100 bytes/row of incompressible-ish payload (md5 hex + id)
    rows = mb * 1024 * 1024 // 100
    df = spark.range(rows).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("p1"),
        F.md5((F.col("id") + 1).cast("string")).alias("p2"),
        F.md5((F.col("id") + 2).cast("string")).alias("p3"),
    )
    out = tempfile.mkdtemp(prefix="dfsio_")
    try:
        path = os.path.join(out, "data")
        t0 = time.monotonic()
        df.repartition(files).write.parquet(path)
        w = time.monotonic() - t0
        actual_mb = sum(
            os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
        ) / (1024 * 1024)
        t0 = time.monotonic()
        n = spark.read.parquet(path).select(F.sum(F.length("p1"))).collect()[0][0]
        r = time.monotonic() - t0
        assert n == rows * 32
        print(
            json.dumps(
                {
                    "metric": "dfsio_throughput",
                    "write_mb_s": round(actual_mb / w, 1),
                    "read_mb_s": round(actual_mb / r, 1),
                    "unit": "MB/sec",
                    "mb_on_disk": round(actual_mb, 1),
                    "files": files,
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
