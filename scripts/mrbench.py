"""MRBench parity (src/test/.../mapred/MRBench.java:41,173-206): the
framework latency floor — average wall-clock of N repeated tiny jobs.

The reference submits a tiny MR job repeatedly and reports average runtime;
here the "tiny job" is a minimal scan→agg over 25 rows, executed end-to-end
(noop sink) N times on a warm session. Usage:

    python scripts/mrbench.py [numRuns=10]

Prints one JSON line {metric, value(avg sec), unit, runs, min, max}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_1_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("mrbench")
    nation = load_table(spark, SF_DIR, "nation")
    job = lambda: nation.groupBy("n_regionkey").count()  # noqa: E731
    job().write.format("noop").mode("overwrite").save()  # warm

    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        job().write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    print(
        json.dumps(
            {
                "metric": "mrbench_avg_tiny_job_latency",
                "value": round(sum(times) / len(times), 4),
                "unit": "sec",
                "runs": runs,
                "min": round(min(times), 4),
                "max": round(max(times), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
