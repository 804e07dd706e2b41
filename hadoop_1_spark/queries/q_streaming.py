"""Structured Streaming queries (north-star §2.9 extension): tumbling /
sliding / session windows + a custom stateful operator over the events
table, each driven to completion with availableNow and oracle-checked
against the equivalent batch SQL (time_bucket / gaps-and-islands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark import streaming
from hadoop_1_spark.queries import q_aggregate
from hadoop_1_spark.registry import register


@register(
    "stream_tumbling_counts",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2
""",
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts per event type (complete mode)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    return streaming.run_to_table(streaming.tumbling_counts(ev), spark, "complete")


@register(
    "stream_sliding_avg",
    oracle="""
WITH pts AS (
  SELECT value, epoch_us(time_bucket(INTERVAL 30 MINUTES, ts)) AS b FROM events
),
w AS (SELECT value, unnest([b, b - 1800000000]) AS window_start_us FROM pts)
SELECT window_start_us,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value,
       CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY 1
""",
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (1h window, 30m slide) average value: every event lands in
    two overlapping windows."""
    ev = streaming.read_events_stream(spark, sf_dir)
    return streaming.run_to_table(streaming.sliding_avg(ev), spark, "complete")


@register(
    "stream_session_windows",
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
g AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + 1800000000 AS session_end_us,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, sid
""",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute gap); the oracle is the classic
    batch gaps-and-islands rewrite of the same semantics."""
    ev = streaming.read_events_stream(spark, sf_dir)
    return streaming.run_to_table(streaming.session_windows(ev), spark, "complete")


@register(
    "stream_stateful_user_stats",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       max(value) AS max_value
FROM events GROUP BY user_id
""",
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, max). Update-mode emissions are monotone, so the latest state
    per user is the max over emissions."""
    ev = streaming.read_events_stream(spark, sf_dir)
    sink = streaming.run_to_table(streaming.stateful_user_stats(ev), spark, "update")
    return sink.groupBy("user_id").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )


@register(
    "stream_dedup",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_unique,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_keys
FROM events
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on event_id, folded to invariant counts
    (events are already unique per event_id, so n_unique == n_keys ==
    count(*) — the identity the batch oracle checks)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    sink = streaming.run_to_table(streaming.stream_dedup(ev), spark, "append")
    return sink.agg(
        F.count("*").cast("long").alias("n_unique"),
        F.count_distinct("event_id").cast("long").alias("n_keys"),
    )


@register(
    "stream_interval_join",
    oracle="""
SELECT p.event_id AS l_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS l_ts_us,
       e.event_id AS r_id,
       CAST(epoch_us(e.ts) AS BIGINT) AS r_ts_us
FROM events p JOIN events e
  ON p.event_type = 'purchase' AND e.event_type = 'error'
 AND p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 10 MINUTES AND e.ts <= p.ts
""",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases joined to same-user errors in
    the preceding 10 minutes. Two watermarked streams; the closed range
    condition bounds both sides' join state (append mode)."""
    p = streaming.read_events_stream(spark, sf_dir).where("event_type = 'purchase'")
    e = streaming.read_events_stream(spark, sf_dir).where("event_type = 'error'")
    return streaming.run_to_table(streaming.interval_join(p, e), spark, "append")


@register(
    "stream_enrich_join",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, e.ts)) AS window_start_us,
       c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS cnt
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension join (broadcast customer dim, stateless in
    Structured Streaming) feeding tumbling per-segment counts — enrich
    then aggregate, the streaming twin of the DistributedCache hash
    join."""
    from hadoop_1_spark.session import load_table

    ev = streaming.read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return streaming.run_to_table(
        streaming.enriched_segment_counts(ev, dim), spark, "complete"
    )


@register(
    "stream_hll_distinct",
    oracle=f"""
WITH {q_aggregate.HLL_SKETCH_CTES}
SELECT event_type,
       round({q_aggregate.HLL_EST_SQL}, 6) AS hll_est,
       sum_inv, v_zero
FROM s
""",
)
def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cardinality: the portable HLL maintained as GroupState
    over the event stream. HLL's register merge is a commutative
    monoid, so the final streamed state is REGISTER-IDENTICAL to the
    batch sketch however the micro-batches split — the oracle here IS
    uniq_count_hll's batch SQL. The estimate is computed JVM-side from
    the final emission (F.round half-up, matching both engines;
    Python's round() is half-even and never touches the output)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    sink = streaming.run_to_table(streaming.stateful_hll(ev), spark, "update")
    final = (
        sink.groupBy("event_type")
        .agg(F.max(F.struct("n_seen", "sum_inv", "v_zero")).alias("_s"))
        .select("event_type", F.col("_s.sum_inv").alias("sum_inv"),
                F.col("_s.v_zero").alias("v_zero"))
    )
    from hadoop_1_spark.operators import aggregate as agg

    est = agg.hll_estimate_col(F.col("sum_inv"))
    return final.select(
        "event_type", F.round(est, 6).alias("hll_est"), "sum_inv", "v_zero"
    )


CMS_PROBES = list(range(1, 21))


def _stream_cms_oracle() -> str:
    probes = ", ".join(str(p) for p in CMS_PROBES)
    w = streaming.CMS_STREAM_WIDTH
    bucket = (
        "('0x' || substr(md5(CAST(d // 2 AS VARCHAR) || ':' || it), "
        f"CASE WHEN d % 2 = 0 THEN 1 ELSE 16 END, 15))::BIGINT % {w}"
    )
    return f"""
WITH items AS (SELECT event_type, CAST(user_id AS VARCHAR) AS it
               FROM events WHERE user_id IS NOT NULL),
g AS (
  SELECT event_type, d, {bucket} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM items, unnest(range(0, {streaming.CMS_STREAM_DEPTH})) t(d)
  GROUP BY 1, 2, 3
),
pr AS (SELECT DISTINCT event_type, p FROM items, unnest([{probes}]) u(p)),
pb AS (
  SELECT pr.event_type, pr.p, d.d,
         {bucket.replace('it', 'CAST(pr.p AS VARCHAR)')} AS bucket
  FROM pr, unnest(range(0, {streaming.CMS_STREAM_DEPTH})) d(d)
),
est AS (
  SELECT pb.event_type, pb.p AS user_id,
         CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS est
  FROM pb LEFT JOIN g ON g.event_type = pb.event_type
                     AND g.d = pb.d AND g.bucket = pb.bucket
  GROUP BY 1, 2
),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen
      FROM items GROUP BY 1)
SELECT est.event_type, n.n_seen, est.user_id, est.est
FROM est JOIN n USING (event_type)
"""


@register("stream_cms_counts", oracle=_stream_cms_oracle())
def stream_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min monitor: the deterministic md5-family CMS
    grid as GroupState per event type, probed for users 1-20. Counter
    addition is a monoid, so the final streamed grid is batch-identical
    however micro-batches split — the oracle rebuilds the grid and
    reads the same min-of-depth estimates in SQL (absent counters are
    zero). Batch siblings: sketch_cms_counts (one-shot build) and
    mv-style cms_merge (shard folding)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    sink = streaming.run_to_table(
        streaming.stateful_cms(ev, CMS_PROBES), spark, "update"
    )
    return (
        sink.groupBy("event_type", "user_id")
        .agg(F.max(F.struct("n_seen", "est")).alias("_s"))
        .select(
            "event_type",
            F.col("_s.n_seen").alias("n_seen"),
            "user_id",
            F.col("_s.est").alias("est"),
        )
    )


def _stream_hist_oracle() -> str:
    step, nb = streaming.HIST_STEP_Q6, streaming.HIST_BINS

    def p(pp: int) -> str:
        return (
            f"CAST(min(CASE WHEN cum * 100 >= n * {pp} THEN bin END) * {step}"
            f" AS BIGINT) AS p{pp}_q6"
        )

    return f"""
WITH v AS (
  SELECT event_type,
         greatest(least(CAST(floor(value * 1000000) AS BIGINT) // {step},
                        {nb - 1}), 0) AS bin
  FROM events WHERE value IS NOT NULL
),
b AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
c AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM b
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_seen,
       {p(50)}, {p(95)}, {p(99)}
FROM c GROUP BY 1
"""


@register("stream_value_histogram", oracle=_stream_hist_oracle())
def stream_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percentile monitor: a fixed 64-bin value histogram as
    GroupState per event type with exact cross-multiplied p50/p95/p99
    readouts. Bin counts are a monoid, so the final streamed state is
    batch-identical however micro-batches split — the oracle is the
    batch binning SQL with the same exact percentile rule. See
    streaming.stateful_value_histogram."""
    ev = streaming.read_events_stream(spark, sf_dir)
    sink = streaming.run_to_table(
        streaming.stateful_value_histogram(ev), spark, "update"
    )
    return (
        sink.groupBy("event_type")
        .agg(F.max(F.struct("n_seen", "p50_q6", "p95_q6", "p99_q6")).alias("_s"))
        .select(
            "event_type",
            F.col("_s.n_seen").alias("n_seen"),
            F.col("_s.p50_q6").alias("p50_q6"),
            F.col("_s.p95_q6").alias("p95_q6"),
            F.col("_s.p99_q6").alias("p99_q6"),
        )
    )


@register(
    "stream_outer_join",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
e AS (SELECT * FROM events WHERE event_type = 'error'),
wm AS (SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM e))
              - INTERVAL 30 MINUTES AS w)
SELECT p.event_id AS l_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS l_ts_us,
       e.event_id AS r_id,
       CAST(epoch_us(e.ts) AS BIGINT) AS r_ts_us
FROM p JOIN e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 10 MINUTES AND e.ts <= p.ts
UNION ALL
SELECT p.event_id, p.user_id, CAST(epoch_us(p.ts) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM p, wm
WHERE p.ts < wm.w
  AND NOT EXISTS (SELECT 1 FROM e WHERE e.user_id = p.user_id
                  AND e.ts >= p.ts - INTERVAL 10 MINUTES AND e.ts <= p.ts)
""",
)
def stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase, with its
    same-user errors from the preceding 10 minutes OR a null-padded row
    once the global watermark proves no match can arrive. The oracle
    replays both legs including the watermark cutoff for unmatched
    lefts (min of both streams' max ts minus the 30-minute delay) —
    the emit-safety rule that makes streaming outer joins incremental.
    See streaming.interval_join_outer."""
    p = streaming.read_events_stream(spark, sf_dir).where("event_type = 'purchase'")
    e = streaming.read_events_stream(spark, sf_dir).where("event_type = 'error'")
    return streaming.run_to_table(
        streaming.interval_join_outer(p, e), spark, "append"
    )


@register(
    "stream_full_outer_join",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
e AS (SELECT * FROM events WHERE event_type = 'error'),
wm AS (SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM e))
              - INTERVAL 30 MINUTES AS w)
SELECT p.event_id AS l_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS l_ts_us,
       e.event_id AS r_id,
       CAST(epoch_us(e.ts) AS BIGINT) AS r_ts_us
FROM p JOIN e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 10 MINUTES AND e.ts <= p.ts
UNION ALL
SELECT p.event_id, p.user_id, CAST(epoch_us(p.ts) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM p, wm
WHERE p.ts < wm.w
  AND NOT EXISTS (SELECT 1 FROM e WHERE e.user_id = p.user_id
                  AND e.ts >= p.ts - INTERVAL 10 MINUTES AND e.ts <= p.ts)
UNION ALL
SELECT CAST(NULL AS BIGINT), e.user_id, CAST(NULL AS BIGINT),
       e.event_id, CAST(epoch_us(e.ts) AS BIGINT)
FROM e, wm
WHERE e.ts + INTERVAL 10 MINUTES < wm.w
  AND NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = e.user_id
                  AND e.ts >= p.ts - INTERVAL 10 MINUTES AND e.ts <= p.ts)
""",
)
def stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: every purchase with its
    same-user errors from the preceding 10 minutes, null-padded rows for
    purchases the watermark proved matchless, AND null-padded rows for
    errors the watermark proved matchless — the per-side emit cutoffs
    are asymmetric (left: wm passes l_ts; right: wm passes r_ts + gap)
    because the range condition is one-sided. The oracle replays both
    legs and both cutoffs in batch SQL. See
    streaming.interval_join_full_outer."""
    p = streaming.read_events_stream(spark, sf_dir).where("event_type = 'purchase'")
    e = streaming.read_events_stream(spark, sf_dir).where("event_type = 'error'")
    return streaming.run_to_table(
        streaming.interval_join_full_outer(p, e), spark, "append"
    )
