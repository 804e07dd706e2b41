"""External-process UDF surface: Hadoop Streaming / Pipes parity
(SURVEY.md §2.10).

The reference runs any executable as mapper/combiner/reducer over
stdin/stdout (contrib/streaming StreamJob.java:76, PipeMapRed.java:212:
fork the process, write records to stdin, read tab-framed records from
stdout). Two Spark-first ports:

- pipe_lines / pipe_kv : `rdd.pipe(cmd)` — byte-exact parity with the
  streaming text framing (line in, line out; key = fields before the
  first tab, PipeMapRed keyValueSplit). Combiner parity is moot: any
  downstream groupBy gets Catalyst partial aggregation automatically.
- subprocess_map_batches : Arrow-batched variant — one subprocess per
  partition batch via mapInPandas, ~vectorized transfer instead of
  per-record Java<->Python<->proc hops. This is the 100 TB path: the
  process launch cost amortizes over a whole Arrow batch and data stays
  columnar until the pipe boundary.

Also here: the UDAF plugin registry, mirroring
UserDefinedValueAggregatorDescriptor (+ registry wiring
ValueAggregatorJob.java:215-218) — named aggregation builders a job
selects by name, extended with pandas GROUPED_AGG plugins.

Scale notes: pipes preserve partitioning (no shuffle); the subprocess is
one fork per batch, not per record; never collect() — the driver sees
only the final reduced result.
"""

from __future__ import annotations

import subprocess
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Streaming-script runners


def pipe_lines(df: DataFrame, command: str, output_col: str = "line") -> DataFrame:
    """Exact Hadoop-Streaming text framing: each row rendered as a
    tab-joined line on the script's stdin; each stdout line becomes a row.
    A mapper may emit 0..n lines per input (UDTF semantics)."""
    spark = df.sparkSession
    cols = [F.col(c).cast("string") for c in df.columns]
    lines = df.select(F.concat_ws("\t", *cols).alias("line"))
    piped = lines.rdd.map(lambda r: r["line"]).pipe(command)
    return spark.createDataFrame(piped.map(lambda s: (s,)), f"{output_col} string")


def pipe_kv(df: DataFrame, command: str) -> DataFrame:
    """pipe_lines + the streaming output contract: key = text before the
    first tab, value = rest (PipeMapRed keyValueSplit; configurable field
    count collapses to 'first tab' for the default 1)."""
    out = pipe_lines(df, command)
    return out.select(
        F.substring_index("line", "\t", 1).alias("key"),
        F.when(
            F.col("line").contains("\t"),
            F.expr("substring(line, length(substring_index(line, '\t', 1)) + 2)"),
        )
        .otherwise(F.lit(""))
        .alias("value"),
    )


def subprocess_map_batches(
    df: DataFrame, argv: list[str], output_col: str = "line"
) -> DataFrame:
    """Arrow-batched external mapper: per Arrow batch, fork argv once,
    write tab-joined lines to stdin, collect stdout lines. Same semantics
    as pipe_lines at a fraction of the per-record overhead."""
    cols = [F.col(c).cast("string") for c in df.columns]
    lines = df.select(F.concat_ws("\t", *cols).alias("line"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payload = ("\n".join(pdf["line"]) + "\n").encode()
            out = subprocess.run(
                argv, input=payload, stdout=subprocess.PIPE, check=True
            ).stdout.decode()
            rows = [ln for ln in out.split("\n") if ln != ""]
            yield pd.DataFrame({output_col: rows})

    return lines.mapInPandas(run, schema=f"{output_col} string")


# ---------------------------------------------------------------------------
# UDAF plugin registry (UserDefinedValueAggregatorDescriptor parity)

# name -> builder(value_col) -> aggregation Column. Built-ins mirror the
# aggregate library's function names; plugins register alongside them.
UDAF_REGISTRY: dict[str, Callable[[Column], Column]] = {
    "LongValueSum": lambda c: F.sum(c.cast("long")),
    # Double-precision accumulation, matching the reference's DoubleValueSum
    # (aggregate/DoubleValueSum.java:29) and operators/aggregate.py; queries
    # needing bit-stable cross-engine sums cast to decimal themselves.
    "DoubleValueSum": lambda c: F.sum(c.cast("double")),
    "LongValueMax": lambda c: F.max(c.cast("long")),
    "LongValueMin": lambda c: F.min(c.cast("long")),
    "StringValueMax": lambda c: F.max(c.cast("string")),
    "StringValueMin": lambda c: F.min(c.cast("string")),
    "UniqValueCount": lambda c: F.count_distinct(c),
}


def register_udaf(name: str, builder: Callable[[Column], Column]) -> None:
    """Register a named aggregation plugin (the analog of
    aggregator.descriptor.* job config entries)."""
    UDAF_REGISTRY[name] = builder


def _median_pandas():
    """A pandas GROUPED_AGG plugin: exact median via numpy — demonstrates
    arbitrary-Python UDAFs living in the same registry as built-ins."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return median_udaf


register_udaf("PandasMedian", lambda c: _median_pandas()(c))


def grouped_aggregate(
    df: DataFrame, key: str, value: str, funcs: list[str]
) -> DataFrame:
    """Evaluate registry functions by name per group — the generic
    ValueAggregator job shape (ValueAggregatorReducer.java:48)."""
    aggs = [UDAF_REGISTRY[f](F.col(value)).alias(f) for f in funcs]
    return df.groupBy(key).agg(*aggs)


def subprocess_map_typedbytes(df: DataFrame, argv: list[str]) -> DataFrame:
    """`-io typedbytes` parity: rows framed as typedbytes VECTOR records on
    the subprocess's stdin; its stdout decoded as typedbytes records with
    the streaming (key, value) contract (first two slots). Binary-safe —
    no tab/newline escaping issues (the reason the reference grew
    typedbytes in the first place)."""
    from hadoop_1_spark.operators import typedbytes as tb

    cols = [F.col(c).cast("string") for c in df.columns]
    lines = df.select(*[c.alias(f"c{i}") for i, c in enumerate(cols)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payload = b"".join(
                tb.encode(tuple(str(v) for v in row)) for row in pdf.itertuples(index=False)
            )
            out = subprocess.run(
                argv, input=payload, stdout=subprocess.PIPE, check=True
            ).stdout
            recs = tb.decode_all(out)
            yield pd.DataFrame(
                {
                    "key": [str(r[0]) if isinstance(r, (tuple, list)) and r else str(r) for r in recs],
                    "value": [
                        str(r[1]) if isinstance(r, (tuple, list)) and len(r) > 1 else ""
                        for r in recs
                    ],
                }
            )

    return lines.mapInPandas(run, schema="key string, value string")
