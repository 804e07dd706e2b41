"""Temporal joins (operators/temporal.py): oracle compare + edge semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_1_spark.operators import temporal
from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize("name", ["asof_signup_attribution", "range_band_join"])
def test_temporal_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def _asof(spark, left_rows, right_rows, direction="backward"):
    left = spark.createDataFrame(left_rows, "k string, ts long, lid long")
    right = spark.createDataFrame(right_rows, "k string, ts long, rid long")
    return {
        (r["k"], r["lid"]): (r["asof_ts"], r["asof_rid"])
        for r in temporal.asof_join(left, right, on="k", ts_col="ts", direction=direction).collect()
    }


def test_asof_backward_picks_latest_prior_inclusive(spark):
    got = _asof(
        spark,
        [("a", 100, 1), ("a", 50, 2), ("a", 10, 3)],
        [("a", 50, 7), ("a", 20, 8), ("b", 1, 9)],
    )
    assert got[("a", 1)] == (50, 7)   # latest <= 100
    assert got[("a", 2)] == (50, 7)   # equal ts matches (inclusive)
    assert got[("a", 3)] == (None, None)  # nothing at or before 10


def test_asof_forward_picks_earliest_following(spark):
    got = _asof(
        spark,
        [("a", 100, 1), ("a", 10, 2)],
        [("a", 50, 7), ("a", 200, 8)],
        direction="forward",
    )
    assert got[("a", 1)] == (200, 8)  # earliest >= 100
    assert got[("a", 2)] == (50, 7)


def test_range_join_half_open_boundaries(spark):
    pts = spark.createDataFrame([(1, 0.0), (2, 10.0), (3, 19.99), (4, 20.0), (5, -1.0)], "pid long, v double")
    ivs = spark.createDataFrame([("lo", 0.0, 20.0), ("hi", 20.0, 40.0)], "name string, lo double, hi double")
    got = {
        (r["pid"], r["name"])
        for r in temporal.range_join(pts, ivs, "v", "lo", "hi", bin_width=7.0).collect()
    }
    # lo inclusive, hi exclusive; -1 matches nothing
    assert got == {(1, "lo"), (2, "lo"), (3, "lo"), (4, "hi")}


def test_range_join_no_duplicate_matches(spark):
    """An interval spanning many bins still matches each point once."""
    pts = spark.createDataFrame([(i, float(i)) for i in range(50)], "pid long, v double")
    ivs = spark.createDataFrame([("all", 0.0, 100.0)], "name string, lo double, hi double")
    rows = temporal.range_join(pts, ivs, "v", "lo", "hi", bin_width=3.0).collect()
    assert len(rows) == 50


def test_asof_join_single_shuffle(spark):
    """The as-of plan shuffles ONCE (the key exchange feeding the window) —
    the property that makes it viable at 100 TB (a join-then-rank
    formulation would add a per-pair join shuffle)."""
    left = spark.createDataFrame([("a", 1, 1)], "k string, ts long, lid long")
    right = spark.createDataFrame([("a", 1, 2)], "k string, ts long, rid long")
    plan = (
        temporal.asof_join(left, right, on="k", ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # count distinct shuffle exchanges (reuse nodes excluded)
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 1, plan


def test_asof_null_ts_rows(spark):
    """NULL-ts right rows match nothing (their payload must not be carried
    forward); NULL-ts left rows get left-join null padding, both directions."""
    for direction in ("backward", "forward"):
        got = _asof(
            spark,
            [("a", 100, 1), ("a", None, 2)],
            [("a", None, 7), ("a", 50, 8), ("a", 150, 9)],
            direction=direction,
        )
        assert got[("a", 2)] == (None, None)
        if direction == "backward":
            assert got[("a", 1)] == (50, 8)
        else:
            assert got[("a", 1)] == (150, 9)


def test_asof_equal_ts_tie_breaks_to_max_payload(spark):
    """Among right rows sharing (key, ts), the greatest payload struct wins —
    deterministic regardless of union/partition order."""
    got = _asof(
        spark,
        [("a", 100, 1)],
        [("a", 50, 7), ("a", 50, 11), ("a", 50, 9)],
    )
    assert got[("a", 1)] == (50, 11)


def test_sessionize_gap_rule(spark):
    """Strictly-greater-than-gap starts a NEW session; exactly-gap stays in
    the same one (the streaming session_window closed-gap rule); NULL ts
    rows are dropped; sessions number 1..n per key in time order."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hadoop_1_spark.operators import temporal

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        ("u1", s(0), 1),
        ("u1", s(10), 2),     # gap 10 == gap_seconds -> same session
        ("u1", s(21), 3),     # gap 11 > 10 -> new session
        ("u1", None, 4),      # dropped
        ("u2", s(5), 5),      # separate key numbers from 1
        ("u2", s(100), 6),    # new session
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long")
    out = temporal.sessionize(df, "k", "ts", gap_seconds=10, tie_cols=["eid"])
    got = {(r.k, r.eid): r.session_seq for r in out.collect()}
    assert got == {
        ("u1", 1): 1, ("u1", 2): 1, ("u1", 3): 2,
        ("u2", 5): 1, ("u2", 6): 2,
    }
    # equal timestamps: tie_cols make numbering deterministic
    dup = spark.createDataFrame(
        [("u", s(0), 2), ("u", s(0), 1), ("u", s(30), 3)],
        "k string, ts timestamp, eid long",
    )
    out2 = temporal.sessionize(dup, "k", "ts", gap_seconds=10, tie_cols=["eid"])
    assert {(r.eid, r.session_seq) for r in out2.collect()} == {(1, 1), (2, 1), (3, 2)}
    # one shuffle feeds both windows (AQE toString repeats the plan under
    # '== Initial Plan ==' — count the final section only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_sessionize_matches_session_window(spark):
    """Batch sessionize and Spark's session_window must carve IDENTICAL
    sessions (same count, start, end) for the same gap — the batch
    backfill / live stream agreement the operator promises."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hadoop_1_spark.operators import temporal

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # deterministic pseudo-random event times: 3 users, bursts + gaps
    for u in range(3):
        t = 0
        for i in range(40):
            t += ((u * 7919 + i * 104729) % 130) + 1   # 1..130 s steps
            rows.append((f"u{u}", t0 + dt.timedelta(seconds=t), u * 100 + i))
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long")
    gap = 60

    sw = {
        (r.k, r["session_window"].start, r["session_window"].end): r["count"]
        for r in df.groupBy(F.session_window("ts", f"{gap} seconds"), "k")
        .count()
        .collect()
    }
    batch = {
        (r.k, r.start, r.end_plus_gap): r.n
        for r in temporal.sessionize(df, "k", "ts", gap_seconds=gap, tie_cols=["eid"])
        .groupBy("k", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("start"),
            (F.max("ts") + F.expr(f"INTERVAL {gap} SECONDS")).alias("end_plus_gap"),
        )
        .collect()
    }
    assert sw == batch and len(sw) > 6


def test_asof_tolerance_nulls_distant_matches(spark):
    """merge_asof-style tolerance: a match further than tolerance is nulled
    (never substituted by an even-older row); in-tolerance matches and
    the no-match case are unaffected."""
    left = spark.createDataFrame(
        [("a", 100, 1), ("a", 1000, 2), ("b", 5, 3)],
        "k string, ts long, lid long",
    )
    right = spark.createDataFrame(
        [("a", 90, 7), ("a", 500, 8)], "k string, ts long, rid long"
    )
    out = {
        (r.k, r.lid): (r.asof_ts, r.asof_rid)
        for r in temporal.asof_join(
            left, right, on="k", ts_col="ts", tolerance=50
        ).collect()
    }
    assert out[("a", 1)] == (90, 7)        # gap 10 <= 50
    assert out[("a", 2)] == (None, None)   # nearest prior is 500, gap 500 > 50
    assert out[("b", 3)] == (None, None)   # no right rows for key


def test_asof_tolerance_ntz_and_fractional(spark):
    """Tolerance works on TIMESTAMP_NTZ columns (unix_micros alone rejects
    them) and on fractional numeric timestamps (no long-floor rounding)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=100), 1)],
        "k string, ts timestamp_ntz, lid long",
    )
    right = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=40), 7)],
        "k string, ts timestamp_ntz, rid long",
    )
    out = temporal.asof_join(left, right, on="k", ts_col="ts",
                             tolerance=60_000_000).collect()
    assert out[0]["asof_rid"] == 7          # gap 60 s == tolerance, kept
    out2 = temporal.asof_join(left, right, on="k", ts_col="ts",
                              tolerance=59_000_000).collect()
    assert out2[0]["asof_rid"] is None      # 60 s > 59 s, nulled

    # fractional doubles: true gap 1.9 must not floor down to 1
    fl = spark.createDataFrame([("a", 5.9, 1)], "k string, ts double, lid long")
    fr = spark.createDataFrame([("a", 4.0, 7)], "k string, ts double, rid long")
    o = temporal.asof_join(fl, fr, on="k", ts_col="ts", tolerance=1).collect()
    assert o[0]["asof_rid"] is None
    # (5.9 - 4.0 is 1.9000000000000004 in IEEE doubles — bound above it)
    o2 = temporal.asof_join(fl, fr, on="k", ts_col="ts", tolerance=1.91).collect()
    assert o2[0]["asof_rid"] == 7


def test_funnel_stages_semantics(spark):
    """Ordering is enforced (a purchase BEFORE signup doesn't convert),
    same-timestamp follow-ups count (>=), the conversion window bounds
    stage gaps, and counts are monotonically non-increasing."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # u1: clean signup -> view -> purchase inside windows
        ("u1", s(0), "signup"), ("u1", s(10), "view"), ("u1", s(20), "purchase"),
        # u2: purchase BEFORE signup — never converts past stage 1
        ("u2", s(0), "purchase"), ("u2", s(10), "signup"),
        # u3: view at the same timestamp as signup (>= counts), no purchase
        ("u3", s(5), "signup"), ("u3", s(5), "view"),
        # u4: view outside the window
        ("u4", s(0), "signup"), ("u4", s(1000), "view"),
        # u5: no signup at all
        ("u5", s(0), "view"), ("u5", s(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    out = {r.stage: r.n_users for r in temporal.funnel_stages(
        df, ["signup", "view", "purchase"], key_col="user_id",
        max_gap_seconds=100).collect()}
    assert out == {1: 4, 2: 2, 3: 1}


def test_scd2_intervals_chain(spark):
    from pyspark.sql import functions as F

    from hadoop_1_spark.operators import temporal

    rows = [
        (1, 10, "2024-01-01 00:00:00", 5.0),
        (1, 11, "2024-01-02 00:00:00", 6.0),
        (1, 12, "2024-01-02 00:00:00", 7.0),  # same ts: event_id breaks tie
        (2, 13, "2024-01-05 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["user_id"], r["version"]): r
        for r in temporal.scd2_history(
            df, "user_id", "ts", "event_id", payload_cols=("value",)
        ).collect()
    }
    # intervals chain: each valid_to == successor's valid_from
    assert got[(1, 1)]["valid_to_us"] == got[(1, 2)]["valid_from_us"]
    assert got[(1, 2)]["valid_to_us"] == got[(1, 3)]["valid_from_us"]
    # equal-ts versions ordered by the tiebreak
    assert got[(1, 2)]["value"] == 6.0 and got[(1, 3)]["value"] == 7.0
    # exactly one current row per key
    assert got[(1, 3)]["is_current"] and got[(2, 1)]["is_current"]
    assert not got[(1, 1)]["is_current"] and not got[(1, 2)]["is_current"]


def test_scd2_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "scd2_user_history")


def test_cusum_matches_sequential_recurrence(spark):
    """The window form S_i = prefix_i - min(0, min prefix) must equal the
    textbook sequential recurrence S_i = max(0, S_{i-1} + d_i)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    vals = [50.0, 52.0, 49.0, 80.0, 85.0, 90.0, 40.0, 95.0]
    target_q6 = 50_000_000
    dq = [int(v * 1_000_000) - target_q6 for v in vals]
    s, expect = 0, []
    for d in dq:
        s = max(0, s + d)
        expect.append(s)

    df = spark.createDataFrame(
        [("t", i, float(v)) for i, v in enumerate(vals)],
        "event_type string, event_id long, value double",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = (F.floor(F.col("value") * 1000000).cast("bigint") - target_q6).alias("dq")
    c = df.select("event_type", "event_id", d).select(
        "event_type", "event_id", F.sum("dq").over(w).alias("csum")
    ).withColumn("cmin", F.min("csum").over(w))
    got = [
        r["s"]
        for r in c.select(
            "event_id", (F.col("csum") - F.least("cmin", F.lit(0))).alias("s")
        ).orderBy("event_id").collect()
    ]
    assert got == expect


def test_cusum_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "anomaly_cusum_events")


def test_cohort_and_transitions_match_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "cohort_retention")
    assert_query_matches_oracle(spark, duck, "path_transitions")


def test_path_transitions_hand_case(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 4, "a"), (2, 5, "b"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    w = Window.partitionBy("user_id").orderBy("event_id")
    o = df.select(
        F.col("event_type").alias("f"), F.lead("event_type").over(w).alias("t")
    ).where(F.col("t").isNotNull())
    got = {(r["f"], r["t"]): r["n"] for r in o.groupBy("f", "t").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}  # no cross-user edge 3->4


def test_locf_fills_gaps_verbatim(spark):
    from pyspark.sql import functions as F
    from hadoop_1_spark import registry  # noqa: F401  (query shape exercised via oracle test)

    # direct semantics: day 0 observed 1.5, day 2 observed 2.5 -> day 1
    # carries 1.5 verbatim, calendar is complete
    from pyspark.sql.window import Window

    rows = [(1, 0, 1.5, True), (1, 2, 2.5, True)]
    eod = spark.createDataFrame(rows, "user_id long, day long, value double, observed boolean")
    span = eod.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    j = cal.join(eod.select("user_id", "day", "value"), ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    got = {
        r["day"]: (r["v"], r["value"] is not None)
        for r in j.select(
            "day", "value", F.last("value", ignorenulls=True).over(w).alias("v")
        ).collect()
    }
    assert got == {0: (1.5, True), 1: (1.5, False), 2: (2.5, True)}


def test_resample_locf_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "resample_locf_daily")


def test_events_concurrency_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "events_concurrency")


def test_interval_concurrency_hand(spark):
    """Three intervals: [0,10], [5,15], [10,20] — closed-interval rule
    means all three are open at t=10 (the [0,10] end counts, the [10,20]
    start counts)."""
    from hadoop_1_spark.operators import temporal

    iv = spark.createDataFrame(
        [(0, 10, "a"), (5, 15, "b"), (10, 20, "c")],
        "s bigint, e bigint, id string",
    )
    out = temporal.interval_concurrency(iv, "s", "e", tie_cols=["id"]).collect()
    got = {(r.t_us, r.delta, r.id): r.concurrency for r in out}
    assert got[(0, 1, "a")] == 1
    assert got[(5, 1, "b")] == 2
    assert got[(10, 1, "c")] == 3   # start sorts before the equal-t end
    assert got[(10, -1, "a")] == 2
    assert got[(15, -1, "b")] == 1
    assert got[(20, -1, "c")] == 0


def test_attribution_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "attribution_first_last")


def test_journey_attribution_hand(spark):
    """One user: view, click, BUY, BUY, view  ->  journey0 first=view
    last=click; journey1 empty -> (direct); trailing view never counted."""
    from pyspark.sql import functions as F

    from hadoop_1_spark.operators import temporal

    rows = [
        (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "buy"),
        (1, 40, 4, "buy"), (1, 50, 5, "view"),
    ]
    df = spark.createDataFrame(rows, "u bigint, t bigint, id bigint, ch string")
    out = temporal.journey_attribution(
        df, "u", "t", "id", "ch", F.col("ch") == "buy"
    ).collect()
    got = {r.channel: (r.first_touch, r.last_touch) for r in out}
    assert got == {"view": (1, 0), "click": (0, 1), "(direct)": (1, 1)}


def test_rolling_window_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "rolling_window_user_value")


def test_sessions_error_overlap_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "sessions_error_overlap")


def test_interval_overlap_join_hand(spark):
    """Bin-spanning intervals pair exactly once; non-overlapping pairs
    never appear; touching endpoints count (closed intervals)."""
    from hadoop_1_spark.operators import temporal

    left = spark.createDataFrame(
        [(1, 0, 25), (2, 30, 35), (3, 90, 95)], "lid bigint, ls bigint, le bigint"
    )
    right = spark.createDataFrame(
        [(10, 20, 32), (11, 35, 40), (12, 50, 60)], "rid bigint, rs bigint, re bigint"
    )
    out = temporal.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=10
    ).select("lid", "rid").collect()
    got = sorted((r.lid, r.rid) for r in out)
    # 1 overlaps 10 ([0,25]x[20,32], spans bins 0..2 x 2..3 -> one pair);
    # 2 overlaps 10 ([30,35]x[20,32]) and 11 (touching at 35);
    # 3 overlaps nothing
    assert got == [(1, 10), (2, 10), (2, 11)]


def test_cdc_merge_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "cdc_merge_customers")


def test_cdc_merge_hand(spark):
    """Update-then-delete drops the key; delete-then-update revives it;
    new-key upsert inserts; untouched snapshot rows pass through."""
    from hadoop_1_spark.operators import temporal

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    chg = spark.createDataFrame(
        [
            (1, "a2", "U", 10), (1, None, "D", 20),        # ends deleted
            (2, None, "D", 10), (2, "b2", "U", 20),        # ends b2
            (9, "new", "U", 5),                            # insert
        ],
        "k bigint, v string, op string, seq bigint",
    )
    out = {
        r.k: r.v
        for r in temporal.cdc_merge(
            snap, chg, "k", seq_cols=["seq"], op_col="op", payload_cols=["v"]
        ).collect()
    }
    assert out == {2: "b2", 3: "c", 9: "new"}


def test_debounce_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "events_debounce")


def test_trailing_counts_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "feature_trailing_counts")
