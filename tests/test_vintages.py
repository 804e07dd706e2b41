"""Temporal-vintage contract: the driver has shipped events.ts as
TIMESTAMP(NANOS) (read as epoch-nanos long under nanosAsLong) and as
TIMESTAMP_MICROS NTZ across rounds. session.normalize_timestamps must fold
BOTH to the same UTC TIMESTAMP, batch and streaming."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

BASE_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in micros
ROWS = [
    (i, BASE_US + i * 37_000_000, i % 3, "purchase" if i % 2 else "error", float(i), "{}")
    for i in range(12)
]


def _write_events(dirpath: str, unit: str) -> str:
    os.makedirs(dirpath, exist_ok=True)
    cols = list(zip(*ROWS))
    ts_us = list(cols[1])
    ts = (
        pa.array([t * 1000 for t in ts_us], pa.timestamp("ns"))
        if unit == "ns"
        else pa.array(ts_us, pa.timestamp("us"))
    )
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": ts,
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    # version 2.6 keeps TIMESTAMP(NANOS) instead of coercing to micros
    pq.write_table(table, os.path.join(dirpath, "events.parquet"), version="2.6")
    return dirpath


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_normalizes_both_vintages(spark, tmp_path, unit):
    from hadoop_1_spark.session import load_table

    sf = _write_events(str(tmp_path / unit), unit)
    df = load_table(spark, sf, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema["ts"]
    got = sorted(
        r["us"] for r in df.select(F.unix_micros("ts").alias("us")).collect()
    )
    assert got == sorted(r[1] for r in ROWS)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_stream_normalizes_both_vintages(spark, tmp_path, unit):
    from hadoop_1_spark import streaming

    sf = _write_events(str(tmp_path / unit), unit)
    ev = streaming.read_events_stream(spark, sf)
    out = streaming.run_to_table(streaming.tumbling_counts(ev), spark, "complete")
    rows = {(r["window_start_us"], r["event_type"]): r["cnt"] for r in out.collect()}
    # 12 events spaced 37 s from midnight span two 1-hour windows
    hour_us = 3_600_000_000
    assert sum(rows.values()) == len(ROWS)
    assert all(w % hour_us == 0 and w >= BASE_US - hour_us for w, _ in rows)
