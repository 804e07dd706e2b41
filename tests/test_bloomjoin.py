"""Bloom-prefilter semi-join tests: exactness vs the plain semi-join,
no-false-negative guarantee, prefilter selectivity, and null handling."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_1_spark.operators import join as J


def _kv(spark, n, offset=0, name="k"):
    return spark.range(n).select((F.col("id") + offset).alias(name))


def test_matches_plain_semi_join(spark):
    big = _kv(spark, 2000)
    small = _kv(spark, 150, offset=1900)  # keys 1900..2049, overlap 1900..1999
    got = sorted(
        r["k"] for r in J.bloom_prefilter_semi_join(big, small, "k").collect()
    )
    want = sorted(
        r["k"]
        for r in big.join(small.distinct(), "k", "left_semi").collect()
    )
    assert got == want == list(range(1900, 2000))


def test_no_false_negatives_tiny_filter(spark):
    """Even a deliberately saturated 1-word filter must keep every true
    match (bloom FPs are filtered by the verify join; FNs are impossible
    by construction)."""
    big = _kv(spark, 500)
    small = _kv(spark, 400)
    out = J.bloom_prefilter_semi_join(big, small, "k", m_words=1, h=2)
    assert out.count() == 400


def test_prefilter_selectivity_disjoint(spark):
    """Disjoint key sets: the probe predicate alone should reject nearly
    everything at the default size (FP rate ~(nh/m)^h ~ 1e-5 here)."""
    big = _kv(spark, 5000)
    small = _kv(spark, 100, offset=100000)
    cond = J.bloom_condition(small, "k")
    passed = big.where(cond).count()
    assert passed <= 5  # ~0 expected
    assert J.bloom_prefilter_semi_join(big, small, "k").count() == 0


def test_null_keys_never_match(spark):
    big = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    small = spark.createDataFrame([(1,), (None,)], "k long")
    got = sorted(
        r["k"] for r in J.bloom_prefilter_semi_join(big, small, "k").collect()
    )
    assert got == [1]


def test_bloom_prefilter_mixed_key_types(spark):
    """Build side int, probe side bigint, same values: every true match
    must survive. Guards the canonicalizing string cast inside
    _bloom_positions — raw-typed xxhash64 hashes int (4 bytes) and
    bigint (8 bytes) differently, which produced systematic false
    negatives (0 of 5 matches) when this cast was briefly removed."""
    from pyspark.sql import functions as F

    from hadoop_1_spark.operators import join as J

    big = spark.range(0, 100).select(F.col("id").cast("bigint").alias("k"))
    small = spark.createDataFrame([(i,) for i in range(5)], "k int")
    got = sorted(r["k"] for r in J.bloom_prefilter_semi_join(big, small, "k").collect())
    assert got == [0, 1, 2, 3, 4]
