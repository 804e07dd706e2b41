"""SparkSession factory + table loading helpers.

Replaces the reference's JobConf/JobClient bootstrap
(``mapred/JobConf.java``, ``mapred/JobClient.java:897``): instead of a typed
key-value job description submitted to a JobTracker, we build one
SparkSession whose Catalyst planner owns scheduling, shuffle, and sort.

Scale notes (100 TB design intent):
- AQE on: runtime partition coalescing + skew-join splitting replace the
  reference's manual ``setNumReduceTasks`` sizing.
- shuffle.partitions defaults to the local core count here; on a real
  cluster AQE re-plans from ``spark.sql.adaptive.coalescePartitions``.
- Arrow enabled so Pandas-UDF paths are vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Temporal columns in the TESTDATA.md star schema (the complete list —
# normalize_timestamps folds exactly these when a nanos-vintage read
# surfaces them as epoch-nanos longs).
TEMPORAL_COLUMNS = frozenset({"ts", "o_orderdate", "l_shipdate"})


def get_spark(app_name: str = "hadoop_1_spark", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver harness contract) or
    all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Driver testdata parquet carries TIMESTAMP(NANOS) (pandas/pyarrow
        # default); Spark has no nanos timestamp — read as epoch-nanos long
        # and convert explicitly via ts_nanos()/to_ts().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # warehouse for bucketed tables (J1 shuffle-free joins); kept out of
        # the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ts_nanos(col):
    """Convert an epoch-nanos long column (see nanosAsLong below) to a
    microsecond timestamp. Integer div, NOT '/': double division loses
    microseconds at 1e18-ns epoch magnitudes (53-bit mantissa)."""
    from pyspark.sql import Column, functions as F

    if not isinstance(col, Column):
        col = F.col(col)
    micros = F.floor(col.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Canonicalize temporal columns across driver-testdata vintages.

    The driver has shipped the events/orders/lineitem temporal columns as
    TIMESTAMP(NANOS) parquet (read here as epoch-nanos longs under
    nanosAsLong) in earlier rounds and as TIMESTAMP_MICROS(isAdjustedToUTC
    =false) (read as TIMESTAMP_NTZ) currently. Downstream operators assume
    ONE type, so every vintage is folded to session-tz TIMESTAMP at micro
    precision; the session timezone is pinned to UTC (get_spark/load_table)
    so the NTZ->TZ cast is the identity on the underlying micros and
    unix_micros() agrees bit-for-bit with DuckDB's tz-free epoch_us()."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            out = out.withColumn(field.name, F.col(field.name).cast("timestamp"))
        elif field.name in TEMPORAL_COLUMNS and isinstance(field.dataType, LongType):
            # a known temporal column (TESTDATA.md contract; TEMPORAL_COLUMNS
            # is the complete list) read from the nanos vintage arrives as an
            # epoch-nanos long under nanosAsLong
            out = out.withColumn(field.name, ts_nanos(field.name))
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema parquet table (TESTDATA.md contract), temporal
    columns normalized to UTC TIMESTAMP (see normalize_timestamps).

    Sets nanosAsLong + UTC session timezone on the live session too — the
    driver harness calls our queries with its own SparkSession, which won't
    have the builder config."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_timestamps(
        spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several tables; also registers each as a temp view so SQL-form
    operators can reference them."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
