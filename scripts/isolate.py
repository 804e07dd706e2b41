"""Isolate one query's cost: build time vs execution time, plus the plan.

Usage: python scripts/isolate.py QUERY [QUERY ...] [--sf DIR] [--runs N]
       [--plan-dir DIR]

For each named query, times separately:
  build_s — calling the registered builder (driver-side work: py4j plan
            construction AND any bounded blocking jobs the builder runs,
            e.g. k-means training collects, bloom-filter builds);
  exec_s  — the noop-sink write of the returned DataFrame (cluster-side
            execution of the final plan).
best-of-N each (same discipline as bench.py). With --plan-dir, writes
``{dir}/{query}_{tag}.txt`` containing explain("formatted") of the final
DataFrame (tag from --tag, default "plan").

This is the guide §1 decomposition tool: bench.py times build+exec fused,
so a query whose builder trains a model inline (sim_pq_topk) or collects
summary state (join_bloom_prefilter) can't be diagnosed from the bench
row alone.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

from hadoop_1_spark import registry  # noqa: E402
from hadoop_1_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--tag", default="plan")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    spark = get_spark("hadoop_1_spark_isolate")
    spark.range(1000).agg({"id": "sum"}).collect()

    for name in args.queries:
        fn = registry.QUERIES[name]
        if not args.no_warmup:
            try:
                fn(spark, "/root/testdata/sf0.001").write.format(
                    "noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"{name}: warmup failed: {e}", file=sys.stderr)
        best_b = best_e = float("inf")
        df = None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"isolate:{name}:build")
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            t1 = time.monotonic()
            spark.sparkContext.setJobDescription(f"isolate:{name}:exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            spark.sparkContext.setJobDescription(None)
            best_b = min(best_b, t1 - t0)
            best_e = min(best_e, t2 - t1)
        print(f"{name}: build={best_b:.3f}s exec={best_e:.3f}s "
              f"total={best_b + best_e:.3f}s (best of {args.runs})")
        if args.plan_dir and df is not None:
            os.makedirs(args.plan_dir, exist_ok=True)
            out = os.path.join(args.plan_dir, f"{name}_{args.tag}.txt")
            with open(out, "w", encoding="utf-8") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"  plan -> {out}")


if __name__ == "__main__":
    main()
