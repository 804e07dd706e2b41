"""Sort family: global total-order sort, secondary sort, top-k, validation.

Reference parity:
- Global total-order sort: examples/Sort.java:53 + TotalOrderPartitioner
  (mapreduce/lib/partition/TotalOrderPartitioner.java:50) + InputSampler
  (mapreduce/lib/partition/InputSampler.java:56).  Spark's ``orderBy`` uses a
  RangePartitioner with reservoir sampling — the same design, built in, so
  ``total_order_sort`` is a thin wrapper that exists to *name* the operator.
- TeraSort/TeraValidate: examples/terasort/TeraSort.java:50,
  TeraValidate.java:52,79 (global order + checksum) -> ``sort_validate``.
- Secondary sort: examples/SecondarySort.java:51,133,145 (partition by
  key-part, sort by (key, value), group by key) -> two faithful forms:
  ``secondary_sort_partitions`` keeps the *pipeline* contract (each partition
  holds whole groups, rows within a group sorted — feed to mapInPandas /
  foreachPartition); ``secondary_sort_rank`` is the *query* form (explicit
  per-group rank, fully declarative).
- Top-k: the reference reaches top-k with a 1-reducer sorted job
  (Grep.java:71-84, gridmix "reference select" README:46-52); Spark's
  ``orderBy().limit(k)`` runs per-partition top-k + a tiny final merge —
  strictly better at scale (no single-reducer bottleneck).

SortValidator parity (src/test/.../mapred/SortValidator.java:93-173): sorted
output is valid iff (records, bytes, order-insensitive checksum) match the
input and keys are non-decreasing across the concatenated partitions.
``sort_validate`` computes those invariants + the sortedness flag in one
pass; at 100 TB the inversion check is a window lag over the sort key —
range-partitioned, no single point of serialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def total_order_sort(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Globally-ordered output (sampled range partitioner under the hood)."""
    return df.orderBy(*cols)


def top_k(df: DataFrame, k: int, *cols: Column | str) -> DataFrame:
    """Top-k by sort spec: per-partition top-k then merge — replaces the
    reference's single-reducer pattern."""
    return df.orderBy(*cols).limit(k)


def _broadcast_offsets(totals: DataFrame, n_col: str = "_n") -> DataFrame:
    """Per-partition totals (_pid, n) -> broadcastable cumulative offsets
    (_pid, _off). coalesce(1) (not an exchange) satisfies the
    empty-partitionBy window's single-partition requirement: the
    cumulative window runs over the O(#partitions) summary rows, never
    data. Shared by global_rank and global_prefix_sum so the subtle
    coalesce-window trick lives in exactly one place."""
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    return totals.coalesce(1).select(
        "_pid", F.coalesce(F.sum(n_col).over(w_off), F.lit(0)).alias("_off")
    )


def global_rank(df: DataFrame, *cols: Column | str, rank_col: str = "rank") -> DataFrame:
    """Distributed global row_number over a total order — never a
    single-partition window. Range-shuffle on the sort key (the
    TotalOrderPartitioner design: partition boundaries respect the order),
    row_number within each partition, plus broadcast cumulative partition
    offsets; the only unpartitioned window runs over the O(partitions)
    per-partition counts, not data rows.

    ``cols`` must define a TOTAL order (include a unique tie-break):
    equal rows could straddle a range boundary and rank arbitrarily.

    Cost note for callers: repartitionByRange executes its CHILD twice —
    once for the range-sampling job, once for the shuffle itself — so an
    input with a non-trivial lineage (multi-column concat, a join)
    should be persisted by the caller first (keyfield_sort_global:
    16.5 -> 13.0 s at sf1 from exactly that). Not done here: for cheap
    lineages (a bare scan) the forced materialization costs more than
    the re-scan it saves."""
    from hadoop_1_spark.operators.caching import persist_tracked

    # persist_tracked pins ONE materialization of the range shuffle: the
    # counts branch and the output branch both read the cached relation, so
    # correctness does not depend on Spark's ReuseExchange rule re-running
    # the (nondeterministically sampled) range partitioner identically
    # (spark.sql.exchange.reuse=false / AQE divergence would otherwise let
    # the branches disagree on boundaries and positions).
    #
    # monotonically_increasing_id on the sorted, cached relation encodes
    # (partition index << 33) | position-within-partition — pid and
    # in-partition rank in one narrow projection, with NO data-side window
    # (the old Window.partitionBy(_pid) forced a full re-shuffle of the
    # data on _pid). Bound: 2^33 rows (~8.6e9) per range partition, far
    # beyond a sane partition size at any scale.
    part = persist_tracked(
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftright("_mid", 33).alias("_pid")
    pos = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = part.select(pid).groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = _broadcast_offsets(counts)
    return (
        part.withColumn("_pid", pid)
        .join(F.broadcast(offsets), "_pid")
        .select(
            (pos + F.col("_off") + 1).cast("bigint").alias(rank_col),
            *df.columns,
        )
    )


def global_prefix_sum(
    df: DataFrame, *cols: Column | str, value_col: str, out_col: str = "cum"
) -> DataFrame:
    """Distributed prefix sum (scan) of ``value_col`` over a total order —
    the budget/quota primitive (token-budget trims, quota-fill sampling,
    cumulative-coverage curves) computed WITHOUT a single-partition
    window. Classic two-pass scan, the running-sum sibling of
    global_rank:

    1. range-shuffle on the sort key + sortWithinPartitions, then ONE
       Arrow pass per partition computes the within-partition running sum
       (mapInPandas preserves within-partition row order — the
       sort_validate precedent) and tags rows with the partition id from
       TaskContext;
    2. per-partition totals (a #partitions-row aggregate) turn into
       cumulative offsets via a window over the tiny counts relation, and
       broadcast back.

    The stage-1 output is pinned via the tracked cache: the offsets
    branch and the output branch both read it, so the nondeterministic
    range-partitioner sampling and the Python stage run exactly once.

    ``cols`` must define a TOTAL order (unique tie-break) for a
    well-defined scan. Integer-exact when ``value_col`` is integral
    (int64 accumulation end-to-end); NULL values count as 0."""
    import pandas as pd  # noqa: F401  (worker-side)

    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType, StructField, StructType,
    )

    from hadoop_1_spark.operators.caching import persist_tracked

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (ByteType, ShortType, IntegerType, LongType)):
        # the scan accumulates int64; a double value would be truncated
        # per-row in stage 1 but summed exactly in the offsets branch —
        # two different wrong answers. Refuse instead.
        raise ValueError(
            f"global_prefix_sum needs an integral value_col; {value_col} is {vtype}"
        )

    part = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    out_schema = StructType(
        list(part.schema.fields)
        + [StructField("_pid", LongType()), StructField(out_col, LongType())]
    )

    def scan(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            vals = pdf[value_col].fillna(0).astype("int64")
            cs = vals.cumsum() + acc
            if len(cs):
                acc = int(cs.iloc[-1])
            pdf = pdf.assign(_pid=pid, **{out_col: cs})
            yield pdf

    stage1 = persist_tracked(part.mapInPandas(scan, out_schema))
    totals = stage1.groupBy("_pid").agg(F.sum(value_col).alias("_n"))
    offsets = _broadcast_offsets(totals)
    return (
        stage1.join(F.broadcast(offsets), "_pid")
        .select(
            *df.columns,
            (F.col(out_col) + F.col("_off")).cast("bigint").alias(out_col),
        )
    )


def secondary_sort_partitions(
    df: DataFrame, partition_key: str, *sort_cols: Column | str, num_partitions: int | None = None
) -> DataFrame:
    """Secondary-sort *pipeline* contract: co-locate whole groups, sort rows
    within partitions by (key, secondary) — the reducer-iterator shape
    (grouped, values sorted) without materializing per-group arrays."""
    parts = df.repartition(num_partitions, partition_key) if num_partitions else df.repartition(partition_key)
    return parts.sortWithinPartitions(partition_key, *sort_cols)


def secondary_sort_rank(df: DataFrame, partition_key: str, *sort_cols: Column | str) -> DataFrame:
    """Secondary-sort *query* form: explicit rank within each group in
    (secondary-sort order). Ties must be broken by the caller's sort spec for
    determinism."""
    w = Window.partitionBy(partition_key).orderBy(*sort_cols)
    return df.withColumn("rn", F.row_number().over(w))


def sort_validate(df: DataFrame, key: Column, checksum: Column | None = None) -> DataFrame:
    """One-row invariants in the SortValidator/TeraValidate style: record
    count, min/max key, an order-insensitive checksum, and whether the data
    is globally sorted by ``key``.

    Distributed exactly like TeraValidate (TeraValidate.java:79: each map
    emits its split's first/last key + checksum; one tiny reduce checks the
    boundaries): a mapInPandas pass computes per-partition (count, min, max,
    checksum-sum, sorted-within) — row order inside a partition is preserved,
    so within-partition sortedness is checkable without any window — then the
    #partitions-row summary is folded with a lag over partition id (range
    partitions are pid-ordered after orderBy). No global single-partition
    window; scales to any number of partitions.
    """
    import pandas as pd

    rows = df.select(key.alias("k"), (checksum if checksum is not None else key).alias("chk"))
    k_type = rows.schema["k"].dataType.simpleString()

    def per_partition(batches):
        n = 0
        lo = hi = None
        chk = 0
        ok = True
        last = None
        for pdf in batches:
            if pdf.empty:
                continue
            n += len(pdf)
            chk += int(pdf["chk"].sum())
            k = pdf["k"]
            if not k.is_monotonic_increasing:
                ok = False
            if last is not None and k.iloc[0] < last:
                ok = False
            last = k.iloc[-1]
            if ok:
                kmin, kmax = k.iloc[0], k.iloc[-1]
            else:
                kmin, kmax = k.min(), k.max()
            lo = kmin if lo is None or kmin < lo else lo
            hi = kmax if hi is None or kmax > hi else hi
        if n:
            yield pd.DataFrame(
                {"records": [n], "min_k": [lo], "max_k": [hi], "chk": [chk], "ok": [ok]}
            )

    per_part = rows.mapInPandas(
        per_partition,
        schema=f"records bigint, min_k {k_type}, max_k {k_type}, chk bigint, ok boolean",
    ).withColumn("pid", F.spark_partition_id())

    w = Window.orderBy("pid")
    bounded = per_part.withColumn("prev_max", F.lag("max_k").over(w))
    return bounded.agg(
        F.sum("records").cast("bigint").alias("records"),
        F.min("min_k").alias("min_key"),
        F.max("max_k").alias("max_key"),
        F.sum("chk").cast("bigint").alias("checksum"),
        (
            F.bool_and("ok")
            & (F.sum(F.when(F.col("prev_max") > F.col("min_k"), 1).otherwise(0)) == 0)
        ).alias("is_sorted"),
    )


def grouped_sorted_apply(df, key_col: str, order_col: str, fn, schema: str):
    """Secondary-sort ITERATOR contract (SURVEY §2.6 O3 / hard-part (c)):
    the reference reducer receives each key's values in sort order
    (examples/SecondarySort.java:223-224). applyInPandas delivers the whole
    group; we sort inside the batch and hand ``fn`` a key-ordered frame —
    correct iterator semantics, bounded by the group fitting in memory
    (use secondary_sort_partitions for streaming-style consumption when
    groups are huge)."""

    def apply(pdf):
        return fn(pdf.sort_values(order_col, kind="mergesort"))

    return df.groupBy(key_col).applyInPandas(apply, schema=schema)


# ---------------------------------------------------------------------------
# Z-order (Morton) data layout
# ---------------------------------------------------------------------------

ZORDER_BITS = 16


def zorder_sql(x: str, y: str, bits: int = ZORDER_BITS, div: str = "div") -> str:
    """Morton-interleave arithmetic as engine-portable SQL text:
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure integer
    multiply/divide/modulo (no shift operators — their syntax differs
    between engines); ``div`` is the integer-division token ('div' for
    Spark SQL, '//' for DuckDB). Inputs are first folded mod 2^bits so
    arbitrary key ranges interleave on their low bits.

    Z-ordering is the multi-dimensional clustering idiom (Morton 1966;
    the Delta/Iceberg OPTIMIZE ZORDER layout): sorting by the interleaved
    key places rows close in BOTH dimensions into the same file, so
    min/max footer stats prune scans for predicates on either column —
    where a plain sort clusters only its leading column."""
    m = 1 << bits
    xs = f"(({x}) % {m})"
    ys = f"(({y}) % {m})"
    terms = []
    for i in range(bits):
        terms.append(f"(({xs} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ys} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_key(x: str, y: str, bits: int = ZORDER_BITS) -> Column:
    """The Morton key as a Spark Column (bigint)."""
    return F.expr(zorder_sql(x, y, bits, div="div")).cast("long")


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int, bits: int = ZORDER_BITS
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the Morton
    key of (x, y): range-partition on the key (disjoint z-ranges per
    file) and sort within each partition (monotone within the file, so
    footer min/max stats are tight for BOTH source columns). The extra
    key column is dropped before writing — layout is carried by row
    order, not schema."""
    keyed = df.withColumn("_z", zorder_key(x, y, bits))
    (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """NTILE(k) from a 1-based global rank and total count — the closed
    form that lets tile assignment ride global_rank's distributed scan
    instead of a single-partition ORDER BY window: the first n mod k
    tiles hold ceil(n/k) rows, the rest floor(n/k). Integral arithmetic
    only (no double division), pure projection; engine-NTILE-identical
    (pinned against DuckDB in tests, including the non-divisible and
    n < k branches)."""
    r0 = rank.cast("bigint") - 1
    big = (n % k).cast("bigint")
    floor_size = ((n - n % k) / k).cast("bigint")  # exact: numerator divisible
    ceil_size = floor_size + 1
    in_big = r0 < big * ceil_size
    tile_big = ((r0 - r0 % ceil_size) / ceil_size).cast("bigint") + 1
    rem = r0 - big * ceil_size
    tile_small = big + ((rem - rem % floor_size) / floor_size).cast("bigint") + 1
    return F.when(in_big, tile_big).otherwise(tile_small).cast("int")
