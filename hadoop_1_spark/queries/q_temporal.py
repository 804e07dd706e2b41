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
