"""Thin-path scaling probe for negative_sample (round-6 verdict #2).

Times sampling.negative_sample(k=3) end-to-end (noop sink) on the
negprobe fixtures written by scripts/gen_scale_probe.py — all three legs
have catalogs >16k items, well past the 2*target full-grid cutoff, so the
hash-thinned BroadcastNestedLoopJoin path is what's measured:

  base   1.5k users x  24k items
  cat10  1.5k users x 240k items  (broadcast side x10; thin threshold /10)
  usr10  15k  users x  24k items  (big side x10 — the production axis)

Prints best-of-3 seconds per leg and the x10 ratios for BENCH_NOTES.

Usage: python scripts/neg_probe.py [probe_dir=/tmp/sf1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_1_spark.operators import sampling  # noqa: E402
from hadoop_1_spark.operators.caching import release_caches  # noqa: E402
from hadoop_1_spark.session import get_spark  # noqa: E402


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark("neg_probe")
    spark.range(1000).agg({"id": "sum"}).collect()  # JVM warmup
    out: dict[str, dict] = {}
    for label, fn in (
        ("exact_rank", lambda p, c: sampling.negative_sample(p, c, k=3, item_col="item")),
        ("prng_draws", lambda p, c: sampling.negative_sample_draws(p, c, k=3, item_col="item")),
    ):
        times: dict[str, float] = {}
        for tag in ("base", "cat10", "usr10"):
            pos = spark.read.parquet(os.path.join(base, f"negprobe_{tag}_pos.parquet"))
            cat = spark.read.parquet(os.path.join(base, f"negprobe_{tag}_cat.parquet"))
            best = float("inf")
            for _ in range(3):
                release_caches()  # cold per run: the sampler pins relations
                t0 = time.monotonic()
                fn(pos, cat).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            times[tag] = round(best, 3)
        out[label] = {
            "legs_s": times,
            "ratio_catalog_x10": round(times["cat10"] / times["base"], 2),
            "ratio_users_x10": round(times["usr10"] / times["base"], 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
