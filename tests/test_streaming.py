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
