"""Structured Streaming family vs batch-SQL oracle + semantics checks."""

from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "stream_tumbling_counts",
        "stream_sliding_avg",
        "stream_session_windows",
        "stream_stateful_user_stats",
        "stream_interval_join",
    ],
)
def test_streaming_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_sliding_doubles_row_mass(spark):
    """Every event contributes to exactly window/slide sliding windows."""
    from hadoop_1_spark import registry
    from hadoop_1_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    total = load_table(spark, sf, "events").count()
    slid = registry.QUERIES["stream_sliding_avg"](spark, sf)
    assert slid.groupBy().sum("n").collect()[0][0] == 2 * total


def test_session_windows_bounded_by_gap(spark):
    from hadoop_1_spark import registry

    rows = registry.QUERIES["stream_session_windows"](spark, "/root/testdata/sf0.001").collect()
    gap_us = 30 * 60 * 1_000_000
    assert rows
    for r in rows:
        # end = last event + gap, so every session spans >= gap
        assert r["session_end_us"] - r["session_start_us"] >= gap_us


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark discipline with a real two-batch file stream: batch 2's
    fresh events advance the watermark past window W; a too-late event for
    W arriving in batch 3 is dropped (append mode emits W exactly once,
    without the late row)."""
    import os
    import time as _t

    from pyspark.sql import functions as F

    src = str(tmp_path / "in")
    os.makedirs(src)
    chk = str(tmp_path / "chk")

    def write_batch(name, rows):
        (
            spark.createDataFrame(rows, "ts string, k string")
            .select(F.col("ts").cast("timestamp").alias("ts"), "k")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    t0 = "2024-01-01 00:00:"
    write_batch("b1", [(f"{t0}10", "a"), (f"{t0}20", "a")])

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .parquet(src)
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute"), "k")
        .count()
        .select(F.col("window.start").cast("string").alias("w"), "k", "count")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_sink")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        # advance watermark far past the first window...
        write_batch("b2", [("2024-01-01 00:05:00", "b")])
        q.processAllAvailable()
        # ...then send a LATE event for the closed first window
        write_batch("b3", [(f"{t0}30", "a")])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r["w"], r["k"]): r["count"] for r in spark.table("wm_sink").collect()}
    # first window emitted once with the on-time count only (late row dropped)
    assert rows[("2024-01-01 00:00:00", "a")] == 2


def test_stream_dedup_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "stream_dedup")


def test_checkpoint_recovery_resumes_stream(spark, tmp_path):
    """Fault-tolerance parity (JobTracker RecoveryManager,
    mapred/JobTracker.java:1226 -> streaming checkpoints): kill a query,
    restart from the same checkpoint, and the resumed run processes ONLY
    the new input — the file sink's commit log yields exactly-once output
    across the failure."""
    import os

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)
    chk = str(tmp_path / "chk")

    def write_batch(vals):
        spark.createDataFrame([(v,) for v in vals], "v long").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start():
        return (
            spark.readStream.schema("v long")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )

    write_batch([1, 2, 3])
    q = start()
    q.processAllAvailable()
    q.stop()  # simulated failure

    write_batch([4, 5])
    q2 = start()  # recovery from checkpoint
    q2.processAllAvailable()
    q2.stop()

    got = sorted(r["v"] for r in spark.read.parquet(out).collect())
    # exactly-once: every record once, none reprocessed after recovery
    assert got == [1, 2, 3, 4, 5]


def test_rocksdb_state_store_provider(spark, tmp_path):
    """The RocksDB state-store scale path actually runs in this Spark: a
    windowed count executes with the RocksDB provider and produces the
    same results as the default provider, and the checkpoint contains
    RocksDB state files."""
    import os

    from pyspark.sql import functions as F

    from hadoop_1_spark import streaming as S

    src = str(tmp_path / "in")
    os.makedirs(src)
    chk = str(tmp_path / "chk")
    (
        spark.createDataFrame(
            [("2024-01-01 00:00:10", "a"), ("2024-01-01 00:00:20", "a"), ("2024-01-01 00:02:05", "b")],
            "ts string, k string",
        )
        .select(F.col("ts").cast("timestamp").alias("ts"), "k")
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    conf_keys = S.rocksdb_state_conf()
    old = {k: spark.conf.get(k, None) for k in conf_keys}
    for k, v in conf_keys.items():
        spark.conf.set(k, v)
    try:
        q = (
            spark.readStream.schema("ts timestamp, k string")
            .parquet(src)
            .withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "1 minute"), "k")
            .count()
            .select(F.col("window.start").cast("string").alias("w"), "k", "count")
            .writeStream.format("memory")
            .queryName("rocksdb_sink")
            .outputMode("complete")
            .option("checkpointLocation", chk)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    rows = {(r["w"], r["k"]): r["count"] for r in spark.table("rocksdb_sink").collect()}
    assert rows == {
        ("2024-01-01 00:00:00", "a"): 2,
        ("2024-01-01 00:02:00", "b"): 1,
    }
    # RocksDB leaves its own artifacts (sst/changelog/zip) under state/
    state_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(chk, "state"))
        for f in fs
    ]
    assert any(f.endswith((".sst", ".zip", ".changelog")) for f in state_files), state_files
