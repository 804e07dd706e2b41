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


def test_bloom_build_single_job_bit_identical(spark):
    """The r14 single-job auto-sized build (masks aggregated at the
    2^16-word cap + driver fold-down) must produce the SAME filter bits
    as the two-job build it replaced: aggregate positions directly at
    the derived size and compare word-for-word. Exercises both the
    fold-down branch (small key set -> m_words < cap) and the sizing
    arithmetic (n_keys from the position-row count)."""
    small = _kv(spark, 300, offset=7)  # 300 distinct keys -> m_words = 512

    # replay the OLD two-job build: distinct count, then masks at m_bits
    n_keys = small.select("k").where(F.col("k").isNotNull()).distinct().count()
    want_bits = max(J.BLOOM_WORDS * J._WORD_BITS, 16 * max(n_keys, 1))
    m_words = 1
    while m_words * J._WORD_BITS < want_bits:
        m_words *= 2
    m_bits = m_words * J._WORD_BITS
    pos = F.explode(
        F.array(*J._bloom_positions(F.col("k"), m_bits, J.BLOOM_HASHES))
    ).alias("_pos")
    words = (
        small.where(F.col("k").isNotNull())
        .select(pos)
        .select(
            F.expr(f"_pos div {J._WORD_BITS}").cast("int").alias("_w"),
            F.pow(F.lit(2.0), (F.col("_pos") % J._WORD_BITS).cast("double"))
            .cast("long")
            .alias("_m"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_m)").alias("_mask"))
        .collect()
    )
    old_filt = [0] * m_words
    for r in words:
        old_filt[r["_w"]] = r["_mask"]

    got_words, new_filt = J._bloom_build_auto(small, "k", J.BLOOM_HASHES)
    assert got_words == m_words
    assert new_filt == old_filt


def test_two_prefiltered_plans_coexist(spark):
    """Two bloom prefilters with DIFFERENT filters must stay independent
    after both are built (round-14 ADVICE: the r14 global temp-view name
    meant a second build replaced the first's view; eager analysis hid it
    for sequential builds, but the name reuse was a latent race for
    concurrent builders and clobbered user views). With per-call view
    names, building plan B must not retarget plan A's probe bits — and
    both plans stay executable after the views are dropped."""
    big = _kv(spark, 2000)
    small_a = _kv(spark, 100, offset=1900)  # overlap 1900..1999
    small_b = _kv(spark, 50, offset=100000)  # disjoint from big
    plan_a = J.bloom_prefilter_semi_join(big, small_a, "k")
    plan_b = J.bloom_prefilter_semi_join(big, small_b, "k")
    # both views are dropped: no global name left behind, no clobbering
    assert not [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("hadoop1_bloom_bf")
    ]
    # execute B first, then A — under the old shared name A's probe read
    # B's bits at best (and raced at worst)
    assert plan_b.count() == 0
    got_a = sorted(r["k"] for r in plan_a.collect())
    assert got_a == list(range(1900, 2000))


def test_bloom_probe_sql_quotes_weird_key_names(spark):
    """Key names the Column API accepts (spaces, dashes) must survive the
    SQL-text probe builder, and backticks must be escaped in the emitted
    text (round-14 ADVICE on raw SQL fragments). Names with raw dots or
    backticks are rejected by F.col itself (INVALID_ATTRIBUTE_NAME_SYNTAX)
    before any SQL text is built, so end-to-end coverage is the space
    case; the backtick case is pinned at the text level."""
    big = spark.createDataFrame([(1,), (2,), (3,)], ["weird key"])
    small = spark.createDataFrame([(2,), (3,)], ["weird key"])
    got = sorted(
        r[0]
        for r in J.bloom_prefilter_semi_join(big, small, "weird key").collect()
    )
    assert got == [2, 3]
    sql = J._bloom_probe_sql("(select 1)", "wei`rd", 64, 1)
    assert "`wei``rd`" in sql
