"""100x scale probe (round-8 verdict item 3): run the ten heaviest
operator families at /tmp/sf1 (10x sf0.1) and /tmp/sf10 (100x sf0.1) and
print the 10x-step ratio table for BENCH_NOTES.  Sub-linear-per-byte =
every sf1->sf10 ratio under 10x on 10x the data.

Generate inputs first:
  python scripts/gen_scale_probe.py /tmp/sf1 50000 10
  python scripts/gen_scale_probe.py /tmp/sf10 500000 100

stream_outer_join is probed as its BATCH REPLAY (the same interval-join
logic over the parquet events — the join's data-scaling, without pricing
micro-batch scheduling); the streaming form's state-boundedness is pinned
separately by tests/test_streaming.py.

Usage: python scripts/scale_probe_sf10.py [sf1_dir] [sf10_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_1_spark import registry  # noqa: E402
from hadoop_1_spark.session import get_spark, load_table  # noqa: E402

QUERIES = [
    "graph_pagerank",
    "graph_pagerank_dangling",
    "graph_triangles",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "sim_pq_topk_scan",
    "events_negative_sample_draws",
    "corpus_ccnet_mix",
    "join_bloom_prefilter",
    "tpch_q9_profit",
    "tpch_q21_waiting",
]


def _stream_outer_join_batch_replay(spark, sf_dir: str):
    """The stream_outer_join query's join logic as one batch plan: inner
    interval matches + watermark-gated unmatched lefts (exactly the
    registered oracle's two legs)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("l_id"), "user_id", F.col("ts").alias("l_ts")
    )
    e = ev.where("event_type = 'error'").select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("_rkey"),
        F.col("ts").alias("r_ts"),
    )
    wm = p.agg(F.max("l_ts").alias("lmax")).crossJoin(
        e.agg(F.max("r_ts").alias("rmax"))
    ).select(
        (F.least("lmax", "rmax") - F.expr("INTERVAL 30 MINUTES")).alias("w")
    )
    cond = (
        (p["user_id"] == e["_rkey"])
        & (e["r_ts"] >= p["l_ts"] - F.expr("INTERVAL 10 MINUTES"))
        & (e["r_ts"] <= p["l_ts"])
    )
    joined = p.join(e, cond, "leftOuter").crossJoin(F.broadcast(wm))
    return joined.where(
        F.col("r_id").isNotNull() | (F.col("l_ts") < F.col("w"))
    ).select(
        "l_id",
        "user_id",
        F.unix_micros("l_ts").alias("l_ts_us"),
        "r_id",
        F.unix_micros("r_ts").alias("r_ts_us"),
    )


def best_of(fn, spark, sf_dir: str, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
    spark = get_spark("scale_probe_sf10")
    spark.range(1000).agg({"id": "sum"}).collect()

    jobs = [(n, registry.QUERIES[n]) for n in QUERIES]
    jobs.append(("stream_outer_join (batch replay)", _stream_outer_join_batch_replay))

    print("| query | sf1 (s) | sf10 (s) | ratio (10x data) |")
    print("| --- | --- | --- | --- |")
    for name, fn in jobs:
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()  # codegen warmup
        t1 = best_of(fn, spark, sf1)
        t10 = best_of(fn, spark, sf10)
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
