"""Temporal-join queries (as-of + range join, operators/temporal.py).

The as-of oracle uses DuckDB's NATIVE ``ASOF JOIN`` — an independent
implementation of the semantics, not a replica of our plan — so the
union+window formulation is checked against a second engine's notion of
as-of, row for row. Timestamps follow the repo convention: load_table
normalizes `ts` to UTC TIMESTAMP at micro precision (whatever the parquet
vintage), so unix_micros here equals DuckDB's tz-free epoch_us.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import temporal
from hadoop_1_spark.registry import _load, register

# (band, lo, hi) — the single source for BOTH engines' band tables.
BANDS = [(f"b{i}", 20.0 * i, 20.0 * (i + 1)) for i in range(10)]


def _us(col: str) -> F.Column:
    """UTC TIMESTAMP (session.normalize_timestamps) -> tz-free unix micros."""
    return F.unix_micros(F.col(col))


@register(
    "asof_signup_attribution",
    oracle="""
SELECT p.event_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       s.event_id AS signup_id,
       CAST(epoch_us(s.ts) AS BIGINT) AS signup_ts_us,
       CAST(epoch_us(p.ts) - epoch_us(s.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts, max(event_id) AS event_id
           FROM events WHERE event_type = 'signup' GROUP BY 1, 2) s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def asof_signup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute every purchase to the user's most recent prior-or-equal
    signup — the classic as-of alignment. One shuffle on user_id (the
    union+carry-forward window), never a per-pair materialization."""
    ev = _load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # Dedup signups per (user_id, ts): native ASOF picks an ARBITRARY row
    # among equal timestamps, so both engines agree on max(event_id) up
    # front (and the operator's own equal-ts tie-break — greatest payload —
    # matches it by construction).
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    joined = temporal.asof_join(purchases, signups, on="user_id", ts_col="ts")
    return (
        joined.where(F.col("asof_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            _us("ts").alias("ts_us"),
            F.col("asof_event_id").alias("signup_id"),
            _us("asof_ts").alias("signup_ts_us"),
            (_us("ts") - _us("asof_ts")).alias("gap_us"),
        )
    )


SESSION_GAP_S = 8 * 3600  # median per-user gap is ~7.3h at sf0.01


def _sess_ctes(filter_user: bool = True) -> str:
    """Shared sessionization CTE block (e/m/s): the lag-mark/running-sum
    replay of temporal.sessionize. Three oracles reuse it
    (sessionize_events, events_concurrency, sessions_error_overlap) so
    the gap rule and tie-break stay in one place."""
    uf = "AND user_id IS NOT NULL" if filter_user else ""
    return f"""
e AS (SELECT user_id, ts, event_id, value FROM events
      WHERE ts IS NOT NULL {uf}),
m AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > CAST({{SESSION_GAP_S}} AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS new_mark
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id, value,
         sum(new_mark) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM m
)""".replace("{SESSION_GAP_S}", str(SESSION_GAP_S))



@register(
    "sessionize_events",
    oracle=f"""
WITH {_sess_ctes(filter_user=False)}
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, session_seq
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization of the event stream (8h inactivity
    closes a session) rolled up to per-session bounds and exact-decimal
    value sums — the batch twin of the streaming session_window query,
    sharing its closed-gap boundary rule. One shuffle on user_id feeds
    both the session numbering window and the rollup."""
    ev = _load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    s = temporal.sessionize(
        ev, key_col="user_id", ts_col="ts",
        gap_seconds=SESSION_GAP_S, tie_cols=["event_id"],
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(_us("ts")).alias("start_us"),
        F.max(_us("ts")).alias("end_us"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def _bands_oracle() -> str:
    rows = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in BANDS)
    return f"""
WITH bands(band, lo, hi) AS (VALUES {rows})
SELECT e.event_id, b.band, e.value AS val
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
"""


@register("range_band_join", oracle=_bands_oracle())
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin events into half-open value bands via the binned range join
    (bin width 7 — deliberately unaligned with the 20-wide bands so
    intervals span multiple bins and the residual predicate is exercised).
    The bands arrive as a SQL VALUES literal (JVM-only build)."""
    ev = _load(spark, sf_dir, "events").select("event_id", "value")
    rows = ", ".join(
        f"('{b}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))" for b, lo, hi in BANDS
    )
    bands = spark.sql(f"SELECT * FROM VALUES {rows} AS t(band, lo, hi)")
    out = temporal.range_join(ev, bands, "value", "lo", "hi", bin_width=7.0)
    return out.select("event_id", "band", F.col("value").alias("val"))


FUNNEL_STAGES = ["signup", "view", "purchase"]
FUNNEL_GAP_S = 4 * 3600


def _funnel_oracle() -> str:
    quoted = ", ".join(f"'{s}'" for s in FUNNEL_STAGES)
    ctes = [
        f"e AS (SELECT user_id, ts, event_type FROM events"
        f" WHERE ts IS NOT NULL AND event_type IN ({quoted}))",
        f"t0 AS (SELECT user_id, min(ts) AS t FROM e"
        f" WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1)",
    ]
    for i, s in enumerate(FUNNEL_STAGES[1:], start=1):
        ctes.append(
            f"t{i} AS (SELECT e.user_id, min(e.ts) AS t"
            f" FROM e JOIN t{i - 1} p USING (user_id)"
            f" WHERE e.event_type = '{s}' AND e.ts >= p.t"
            f" AND e.ts <= p.t + INTERVAL {FUNNEL_GAP_S} SECONDS GROUP BY 1)"
        )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{s}' AS event_type,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM t{i}) AS n_users"
        for i, s in enumerate(FUNNEL_STAGES)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


@register("funnel_conversion", oracle=_funnel_oracle())
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup -> view -> purchase conversion funnel with a 4-hour
    per-stage window: users reaching each ordered stage (earliest
    qualifying event, >= previous stage time, within the window). One
    shuffle — per-user sorted event arrays walked with codegen'd folds,
    not a per-stage join chain. See temporal.funnel_stages."""
    return temporal.funnel_stages(
        _load(spark, sf_dir, "events"), FUNNEL_STAGES,
        max_gap_seconds=FUNNEL_GAP_S,
    )


@register(
    "scd2_user_history",
    oracle="""
WITH c AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, value,
         CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
         CAST(epoch_us(lead(ts) OVER w) AS BIGINT) AS valid_to_us,
         lead(ts) OVER w IS NULL AS is_current,
         CAST(row_number() OVER w AS INT) AS version
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT * FROM v
""",
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history table from the purchase change stream: per user,
    versioned [valid_from, valid_to) intervals with exclusive successor
    bounds, is_current flags, and (ts, event_id)-total-ordered version
    numbers — the warehouse dimension-history build. One keyed shuffle;
    see temporal.scd2_history."""
    ev = _load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return temporal.scd2_history(
        ev, "user_id", "ts", "event_id", payload_cols=("value",)
    )


CUSUM_TARGET_Q6 = 50_000_000   # target mean (q6): values drift-test vs 50.0
CUSUM_H_Q6 = 2_000_000_000     # alert threshold h (q6): 2000 value-units


@register(
    "anomaly_cusum_events",
    oracle=f"""
WITH q AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 1000000) AS BIGINT) - {CUSUM_TARGET_Q6} AS dq
  FROM events
),
c AS (
  SELECT event_type, event_id, ts,
         sum(dq) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS csum
  FROM q
),
s AS (
  SELECT event_type, event_id,
         CAST(csum - least(min(csum) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING), 0)
              AS BIGINT) AS cusum_q6
  FROM c
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(cusum_q6) AS BIGINT) AS max_cusum_q6,
       CAST(count(CASE WHEN cusum_q6 > {CUSUM_H_Q6} THEN 1 END) AS BIGINT)
         AS n_alerts,
       CAST(min(CASE WHEN cusum_q6 > {CUSUM_H_Q6} THEN event_id END) AS BIGINT)
         AS first_alert_event
FROM s GROUP BY 1
""",
)
def anomaly_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per event type (Page 1954, the
    classic sequential change detector): S_i = max(0, S_{i-1} + (x_i -
    target)) alerts when the stream's mean drifts above the target. The
    sequential recurrence is cleared to window arithmetic — S_i =
    prefix_i - min(0, min prefix so far) — so the detector runs as ONE
    keyed shuffle with two cumulative windows over q6-quantized
    integers, and the alert SET replays exactly in the oracle. Per-type
    summary: max statistic, alert count, first alerting event."""
    ev = _load(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    dq = (
        F.floor(F.col("value") * 1000000).cast("bigint")
        - F.lit(CUSUM_TARGET_Q6)
    ).alias("dq")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    q = ev.select("event_type", "event_id", "ts", dq)
    # the running min shares the SAME event-time order as the prefix sum
    c = q.select(
        "event_type",
        "event_id",
        "ts",
        F.sum("dq").over(w).alias("csum"),
    ).withColumn(
        "cmin",
        F.min("csum").over(
            Window.partitionBy("event_type")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    s = c.select(
        "event_type",
        "event_id",
        (F.col("csum") - F.least(F.col("cmin"), F.lit(0))).alias("cusum_q6"),
    )
    alert = F.col("cusum_q6") > CUSUM_H_Q6
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("cusum_q6").cast("bigint").alias("max_cusum_q6"),
        F.count(F.when(alert, 1)).cast("bigint").alias("n_alerts"),
        F.min(F.when(alert, F.col("event_id"))).cast("bigint").alias("first_alert_event"),
    )


@register(
    "cohort_retention",
    oracle="""
WITH s AS (
  SELECT user_id,
         CAST(floor(epoch_us(min(ts)) / (CAST(604800 AS BIGINT) * 1000000)) AS BIGINT) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
a AS (
  SELECT DISTINCT e.user_id, s.cohort_week,
         CAST(floor(epoch_us(e.ts) / (CAST(604800 AS BIGINT) * 1000000)) AS BIGINT)
           - s.cohort_week AS week_offset
  FROM events e JOIN s USING (user_id)
)
SELECT cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a WHERE week_offset >= 0
GROUP BY 1, 2
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-signup epoch week,
    counted as active in each subsequent week offset — the standard
    product-analytics artifact. Exact integer epoch-week arithmetic
    (floor over epoch micros), one user-keyed shuffle for the cohort
    assignment plus the distinct (the broadcast of the cohort relation
    is AQE's call at scale)."""
    ev = _load(spark, sf_dir, "events")
    week = lambda c: F.floor(F.unix_micros(c) / F.lit(604800 * 1000000)).cast("bigint")  # noqa: E731
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(week(F.min("ts")).alias("cohort_week"))
    )
    a = (
        ev.join(s, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("week_offset"),
        )
        .where(F.col("week_offset") >= 0)
        .distinct()
    )
    return a.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


@register(
    "path_transitions",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE next_type IS NOT NULL
GROUP BY 1, 2
""",
)
def path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: event-type transition counts from each
    user's (ts, event_id)-ordered stream — the Markov-chain edge counts
    behind funnel/journey tooling. One keyed shuffle (the per-user
    window), then a wordcount-shaped pair count."""
    from pyspark.sql.window import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    o = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    return o.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@register(
    "resample_locf_daily",
    oracle="""
WITH d AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         ts, event_id, value
  FROM events
),
eod AS (
  SELECT user_id, day, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, day
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM d) WHERE rn = 1
),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
cal AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM span),
j AS (
  SELECT c.user_id, c.day, e.value, e.value IS NOT NULL AS observed
  FROM cal c LEFT JOIN eod e ON c.user_id = e.user_id AND c.day = e.day
)
SELECT user_id, day,
       last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                                            ROWS UNBOUNDED PRECEDING) AS value,
       observed
FROM j
""",
)
def resample_locf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled time-series resampling: every user gets a COMPLETE
    daily calendar between their first and last event day (integer
    epoch-day buckets), carrying the last end-of-day observation
    forward through unobserved days (LOCF) — the regularization step
    before any rolling-window or forecasting math. Shape: one keyed
    shuffle feeds the end-of-day pick, the per-user span, the calendar
    explode (sequence — no generator UDF), and the carry-forward
    window; carried values are verbatim copies, so no float arithmetic
    enters the gap fill."""
    from pyspark.sql.window import Window

    ev = _load(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000)).cast("bigint")
    d = ev.select("user_id", day.alias("day"), "ts", "event_id", "value")
    w_last = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    eod = (
        d.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    span = d.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(
        "user_id", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    j = cal.join(eod, ["user_id", "day"], "left").select(
        "user_id", "day", "value", F.col("value").isNotNull().alias("observed")
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        "day",
        F.last("value", ignorenulls=True).over(w_fill).alias("value"),
        "observed",
    )


CONC_TOP = 10


@register(
    "events_concurrency",
    oracle=f"""
WITH {_sess_ctes()},
iv AS (SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
              min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
       FROM s GROUP BY 1, 2),
b AS (
  SELECT start_us AS t_us, CAST(1 AS BIGINT) AS delta, user_id, session_seq FROM iv
  UNION ALL
  SELECT end_us, CAST(-1 AS BIGINT), user_id, session_seq FROM iv
),
c AS (
  SELECT t_us, delta, user_id, session_seq,
         sum(delta) OVER (ORDER BY t_us, delta DESC, user_id, session_seq
                          ROWS UNBOUNDED PRECEDING) AS concurrency
  FROM b
)
SELECT t_us, CAST(delta AS BIGINT) AS delta, user_id,
       session_seq, CAST(concurrency AS BIGINT) AS concurrency
FROM c
ORDER BY concurrency DESC, t_us ASC, user_id ASC, session_seq ASC, delta DESC
LIMIT {CONC_TOP}
""",
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency analysis: sessionize the event stream (the
    sessionize_events gap rule), sweep the session intervals, and
    report the top-10 highest-concurrency boundary moments with a
    fully tie-broken order. The oracle replays the sweep with a global
    SQL window; Spark runs it as the distributed two-pass scan
    (interval_concurrency -> global_prefix_sum), so agreement checks
    the scan against the window semantics it replaces."""
    ev = _load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    ev = ev.where(F.col("user_id").isNotNull())
    s = temporal.sessionize(
        ev, key_col="user_id", ts_col="ts",
        gap_seconds=SESSION_GAP_S, tie_cols=["event_id"],
    )
    iv = s.groupBy("user_id", "session_seq").agg(
        F.min(_us("ts")).alias("start_us"), F.max(_us("ts")).alias("end_us")
    )
    conc = temporal.interval_concurrency(
        iv, "start_us", "end_us", tie_cols=["user_id", "session_seq"]
    )
    return conc.orderBy(
        F.desc("concurrency"), F.asc("t_us"), F.asc("user_id"),
        F.asc("session_seq"), F.desc("delta"),
    ).limit(CONC_TOP)


@register(
    "attribution_first_last",
    oracle="""
WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
           WHERE ts IS NOT NULL AND user_id IS NOT NULL),
j AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS journey
  FROM e
),
convs AS (SELECT user_id, journey FROM j WHERE conv = 1),
touch AS (
  SELECT user_id, journey, event_type,
         row_number() OVER (PARTITION BY user_id, journey
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, journey
                            ORDER BY ts DESC, event_id DESC) AS rnd
  FROM j WHERE conv = 0
),
attributed AS (
  SELECT coalesce(f.event_type, '(direct)') AS fc,
         coalesce(l.event_type, '(direct)') AS lc
  FROM convs c
  LEFT JOIN (SELECT user_id, journey, event_type FROM touch WHERE rn = 1) f
    USING (user_id, journey)
  LEFT JOIN (SELECT user_id, journey, event_type FROM touch WHERE rnd = 1) l
    USING (user_id, journey)
),
fct AS (SELECT fc AS channel, CAST(count(*) AS BIGINT) AS first_touch
        FROM attributed GROUP BY 1),
lct AS (SELECT lc AS channel, CAST(count(*) AS BIGINT) AS last_touch
        FROM attributed GROUP BY 1)
SELECT coalesce(fct.channel, lct.channel) AS channel,
       CAST(coalesce(first_touch, 0) AS BIGINT) AS first_touch,
       CAST(coalesce(last_touch, 0) AS BIGINT) AS last_touch
FROM fct FULL OUTER JOIN lct ON fct.channel = lct.channel
""",
)
def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution rollup: every purchase credits the first
    and the last touchpoint of its journey (the events since the user's
    previous purchase); empty journeys credit '(direct)'. Exact
    whole-count credit in both models — the deterministic subset of
    multi-touch attribution (fractional splits can't hash-match across
    engines). One user-keyed shuffle feeds journey numbering, touch
    ranking, and the rollup."""
    ev = _load(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return temporal.journey_attribution(
        ev, key_col="user_id", ts_col="ts", tie_col="event_id",
        channel_col="event_type",
        is_conversion=F.col("event_type") == "purchase",
    )


@register(
    "rolling_window_user_value",
    oracle="""
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                  CAST(value AS DECIMAL(18,6)) AS v
           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
d AS (SELECT user_id, day, CAST(sum(v) AS DECIMAL(38,6)) AS day_v,
             CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
r AS (SELECT user_id, day,
             CAST(sum(day_v) OVER w AS DECIMAL(38,6)) AS roll_v,
             CAST(sum(n) OVER w AS BIGINT) AS roll_n
      FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day
                          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT user_id, day, CAST(roll_v AS VARCHAR) AS roll_sum, roll_n
FROM r
""",
)
def rolling_window_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day per-user value sum — the time-RANGE window frame
    (value-based bounds over epoch days, not row counts), exercised
    nowhere else in the catalog. Days are pre-aggregated first so the
    range frame slides over day rows, not events; sums stay
    DECIMAL(38,6)-exact and ship as strings. One user-keyed shuffle
    shared by the day rollup and the window."""
    from pyspark.sql.window import Window

    ev = _load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    day = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    ).groupBy("user_id", "day").agg(
        F.sum("v").cast("decimal(38,6)").alias("day_v"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
    return day.select(
        "user_id",
        "day",
        F.sum("day_v").over(w).cast("decimal(38,6)").cast("string").alias("roll_sum"),
        F.sum("n").over(w).cast("bigint").alias("roll_n"),
    )


@register(
    "sessions_error_overlap",
    oracle=f"""
WITH {_sess_ctes()},
iv AS (SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
              min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
       FROM s GROUP BY 1, 2),
ew AS (SELECT epoch_us(ts) // 86400000000 AS err_day,
              min(epoch_us(ts)) AS w_s, max(epoch_us(ts)) AS w_e
       FROM events WHERE event_type = 'error' AND ts IS NOT NULL
       GROUP BY 1)
SELECT ew.err_day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT iv.user_id) AS BIGINT) AS n_users
FROM iv JOIN ew ON iv.s_us <= ew.w_e AND ew.w_s <= iv.e_us
GROUP BY 1
""",
)
def sessions_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap: user sessions joined to per-day
    error-storm windows (min..max error timestamp per day), counting
    affected sessions and users per window. Spark runs the binned
    grid join (day-width bins, residual overlap predicate, closed-form
    pair ownership — no BNLJ, no distinct); the oracle runs the naive
    theta join, checking the grid join finds each overlapping pair
    exactly once."""
    ev = _load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    s = temporal.sessionize(
        ev.select("user_id", "ts", "event_id"),
        key_col="user_id", ts_col="ts",
        gap_seconds=SESSION_GAP_S, tie_cols=["event_id"],
    )
    iv = s.groupBy("user_id", "session_seq").agg(
        F.min(_us("ts")).alias("s_us"), F.max(_us("ts")).alias("e_us")
    )
    ew = (
        _load(spark, sf_dir, "events")
        .where((F.col("event_type") == "error") & F.col("ts").isNotNull())
        .select(_us("ts").alias("t"))
        .groupBy(F.expr("t div 86400000000").alias("err_day"))
        .agg(F.min("t").alias("w_s"), F.max("t").alias("w_e"))
    )
    joined = temporal.interval_overlap_join(
        iv, ew, "s_us", "e_us", "w_s", "w_e", bin_width=86_400_000_000
    )
    return joined.groupBy("err_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "cdc_merge_customers",
    oracle="""
WITH chg AS (
  SELECT user_id AS c_custkey,
         'user-' || CAST(user_id AS VARCHAR) AS c_name,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS balance,
         CASE WHEN event_type = 'signup' THEN 'U' ELSE 'D' END AS op,
         epoch_us(ts) AS s1, event_id AS s2
  FROM events
  WHERE event_type IN ('signup', 'error')
    AND user_id IS NOT NULL AND ts IS NOT NULL
),
base AS (
  SELECT c_custkey, c_name,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS balance,
         'U' AS op, 0 AS is_chg,
         CAST(NULL AS BIGINT) AS s1, CAST(NULL AS BIGINT) AS s2
  FROM customer
),
u AS (
  SELECT * FROM base
  UNION ALL
  SELECT c_custkey, c_name, balance, op, 1, s1, s2 FROM chg
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey
                               ORDER BY is_chg DESC, s1 DESC, s2 DESC) AS rn
  FROM u
)
SELECT c_custkey, c_name, balance FROM r WHERE rn = 1 AND op <> 'D'
""",
)
def cdc_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics: a CDC batch derived from events (signups =
    full-row upserts with a synthesized row image, errors = deletes,
    ordered by (ts, event_id)) applied to the customer snapshot with
    latest-op-wins — one union + one keyed window, delta-sized cost.
    New keys insert, deleted keys vanish even if present in the base,
    and unchanged snapshot rows pass through verbatim."""
    cust = _load(spark, sf_dir, "customer")
    ev = _load(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "error")
        & F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    changes = ev.select(
        F.col("user_id").alias("c_custkey"),
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("c_name"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("balance"),
        F.when(F.col("event_type") == "signup", F.lit("U")).otherwise(F.lit("D")).alias("op"),
        _us("ts").alias("s1"),
        F.col("event_id").alias("s2"),
    )
    snap = cust.select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("decimal(18,2)").cast("string").alias("balance"),
    )
    return temporal.cdc_merge(
        snap, changes, "c_custkey", seq_cols=["s1", "s2"],
        op_col="op", payload_cols=["c_name", "balance"],
    )


DEBOUNCE_S = 60


@register(
    "events_debounce",
    oracle=f"""
WITH e AS (SELECT user_id, event_type, ts, event_id FROM events
           WHERE ts IS NOT NULL AND user_id IS NOT NULL),
m AS (
  SELECT user_id, event_type, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev
  FROM e
)
SELECT user_id, event_type, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us
FROM m
WHERE prev IS NULL
   OR epoch_us(ts) - epoch_us(prev) > CAST({DEBOUNCE_S} AS BIGINT) * 1000000
""",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: drop repeat (user, event_type) firings within 60 s of
    the previous KEPT-OR-DROPPED one (lag rule — the double-click /
    retry-storm cleaner; strictly-greater gap keeps, mirroring the
    sessionize closed-gap convention). One keyed shuffle, lag + filter,
    no state beyond the window sort."""
    ev = _load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    prev = F.lag(F.col("ts")).over(w)
    return (
        ev.withColumn("_prev", prev)
        .where(
            F.col("_prev").isNull()
            | (F.unix_micros("ts") - F.unix_micros("_prev")
               > F.lit(DEBOUNCE_S * 1_000_000))
        )
        .select("user_id", "event_type", "event_id", _us("ts").alias("ts_us"))
    )


@register(
    "feature_trailing_counts",
    oracle="""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s
           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
SELECT user_id, event_id,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_s
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_1h
FROM e
""",
)
def feature_trailing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event velocity feature: how many events this user fired in
    the trailing hour INCLUDING this one — the fraud/abuse rate
    feature, computed at event grain with a time-RANGE frame over epoch
    seconds (the second RANGE-frame shape beside the day-grain rolling
    sum). One user-keyed shuffle; frames stay per-user bounded."""
    ev = _load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    from pyspark.sql.window import Window

    e = ev.select(
        "user_id", "event_id", F.expr("unix_micros(ts) div 1000000").alias("_s")
    )
    w = Window.partitionBy("user_id").orderBy("_s").rangeBetween(-3600, 0)
    return e.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
    )
