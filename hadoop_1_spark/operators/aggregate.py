"""The Aggregate library: declarative named-aggregation framework.

Reference parity (mapred/lib/aggregate, 1,807 LoC):
- Descriptors turn each record into ("<FunctionName>:<id>", value) pairs
  (ValueAggregatorBaseDescriptor.generateEntry:84-85); generic
  mapper/combiner/reducer evaluate the function named in the key
  (generateValueAggregator:94-110).  Output: one (id, report-string) row per
  aggregation id (TextOutputFormat key\tvalue).
- Functions: LongValueSum, DoubleValueSum, LongValueMax/Min,
  StringValueMax/Min, UniqValueCount (with cap — UniqValueCount.java:36,81:
  insertion stops once size exceeds the cap, so the result is
  min(distinct, cap+1)), ValueHistogram (ValueHistogram.java:78-134: report =
  "#unique\tmin\tmedian\tmax\tavg\tstddev" over the per-value frequencies,
  median = sorted_counts[n/2] (upper median), stddev = population).

Spark-first design: each descriptor is a (function, id-expr, value-expr)
triple compiled into a per-function DataFrame aggregation; the per-function
plans are unioned.  Catalyst runs partial aggregation map-side — exactly the
reference's combiner (ValueAggregatorCombiner.java:51) without the string
round-trip.  The combiner-parity subtlety (UniqValueCount caps inside the
combiner too) is semantics-free here because min(distinct, cap+1) commutes
with partial aggregation on exact distincts.

Scale note: every function is a hash aggregation on (function, id) — no
collect_list in the scalable paths.  The only array materialization is the
report-string histogram (bounded by distinct values per id), kept for exact
textual parity; ``histogram_stats`` is the scalable typed variant.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LONG_VALUE_SUM = "LongValueSum"
DOUBLE_VALUE_SUM = "DoubleValueSum"
LONG_VALUE_MAX = "LongValueMax"
LONG_VALUE_MIN = "LongValueMin"
STRING_VALUE_MAX = "StringValueMax"
STRING_VALUE_MIN = "StringValueMin"
UNIQ_VALUE_COUNT = "UniqValueCount"
VALUE_HISTOGRAM = "ValueHistogram"


@dataclass
class Descriptor:
    """One aggregation the framework should compute.

    ``id`` may embed record data (e.g. ``concat(lit("count_"), col("word"))``)
    — the reference's descriptors do exactly this (AggregatorTests.java:38).
    """

    func: str
    id: Column
    value: Column


def uniq_value_count(col: Column, cap: int | None = None) -> Column:
    """Exact distinct count with the reference's cap semantics:
    min(distinct, cap+1) — insertion stops only after the size *exceeds* the
    cap (UniqValueCount.addNextValue:81, confirmed by TestAggregates: cap 14
    over 19 distinct values reports 15).  ``approx_count_distinct`` is the
    100TB-scale alternative when exactness isn't required."""
    c = F.count_distinct(col)
    if cap is not None:
        c = F.least(c, F.lit(cap + 1))
    return c


def _long_form(df: DataFrame, descriptors: list[Descriptor]) -> DataFrame:
    """(func, id, value) rows from ONE scan: every record explodes into one
    entry per descriptor — exactly the reference mapper's shape
    (ValueAggregatorMapper.map emits each descriptor's generateKeyValPairs
    per input record). A per-descriptor union would rescan the input
    len(descriptors) times."""
    entries = F.array(
        *[
            F.struct(
                F.lit(d.func).alias("func"),
                d.id.cast("string").alias("id"),
                d.value.cast("string").alias("value"),
            )
            for d in descriptors
        ]
    )
    return df.select(F.explode(entries).alias("e")).select("e.func", "e.id", "e.value")


def _histogram_freqs(hist: DataFrame) -> DataFrame:
    """Parse ValueHistogram inputs ("xxx" or "xxx\\tcount",
    ValueHistogram.addNextValue:46-64) and sum per-(id, value) frequencies."""
    has_count = F.col("value").contains("\t")
    inc = F.when(has_count, F.substring_index("value", "\t", -1).cast("long")).otherwise(F.lit(1))
    # lastIndexOf("\t") split: value part is everything before the last tab.
    vpart = F.when(
        has_count,
        F.expr("substring(value, 1, length(value) - length(substring_index(value, '\t', -1)) - 1)"),
    ).otherwise(F.col("value"))
    return (
        hist.select("id", vpart.alias("val"), inc.alias("inc"))
        .groupBy("id", "val")
        .agg(F.sum("inc").alias("cnt"))
    )


def histogram_report_df(hist_long: DataFrame) -> DataFrame:
    """Exact ValueHistogram.getReport parity: per id, the tab-joined string
    "#unique\\tmin\\tmedian\\tmax\\tavg\\tstddev" (ValueHistogram.java:78-134).
    avg/stddev rendered via cast-to-string = Java Double.toString."""
    freqs = _histogram_freqs(hist_long)
    stats = freqs.groupBy("id").agg(
        F.sort_array(F.collect_list("cnt")).alias("counts"),
        F.count("*").alias("n"),
        F.sum("cnt").alias("total"),
    )
    n = F.col("n")
    avg = F.col("total") * 1.0 / n
    # Java iterates the sorted array summing squared diffs — reproduce the
    # exact summation order with a higher-order aggregate over sorted counts.
    ssq = F.aggregate(
        F.col("counts"),
        F.lit(0.0),
        lambda acc, c: acc + (c - avg) * (c - avg),
    )
    sd = F.sqrt(ssq / n)
    median = F.element_at(F.col("counts"), (n / 2).cast("int") + 1)
    report = F.concat_ws(
        "\t",
        n.cast("string"),
        F.element_at("counts", 1).cast("string"),
        median.cast("string"),
        F.element_at(F.col("counts"), n.cast("int")).cast("string"),
        avg.cast("string"),
        sd.cast("string"),
    )
    return stats.select("id", report.alias("value"))


def histogram_stats(df: DataFrame, id_col: Column, value_col: Column) -> DataFrame:
    """Typed ValueHistogram: the same statistics as getReport but as numeric
    columns. TWO hash aggregations, TWO exchanges total — (id, val) for the
    frequencies, then (id) with a sorted per-id counts array from which every
    statistic (including the upper median, counts[n/2],
    ValueHistogram.java:104) is derived arithmetic-only.

    Memory parity note: the per-id array is NOT a scale regression — the
    reference reducer itself materializes the full per-key value->count
    TreeMap in memory (ValueHistogram.addNextValue/getReport), so the sorted
    counts array is exactly the reference's working set, minus the value
    strings. The earlier window+two-join formulation recomputed the frequency
    table three times (6 exchanges) to avoid the array; at 100 TB the array
    bound (distinct values per id) is the same either way and the two-agg
    shape shuffles strictly less."""
    freqs = (
        df.select(id_col.alias("id"), value_col.alias("val"))
        .groupBy("id", "val")
        .agg(F.count("*").alias("cnt"))
    )
    stats = freqs.groupBy("id").agg(
        F.sort_array(F.collect_list("cnt")).alias("counts")
    )
    n = F.size("counts").cast("bigint")
    total = F.aggregate("counts", F.lit(0).cast("bigint"), lambda acc, c: acc + c)
    total_sq = F.aggregate("counts", F.lit(0).cast("bigint"), lambda acc, c: acc + c * c)
    avg = total * 1.0 / n
    sd = F.sqrt(total_sq * 1.0 / n - avg * avg)
    return stats.select(
        "id",
        n.alias("unique_values"),
        F.element_at("counts", 1).cast("bigint").alias("min_freq"),
        F.element_at(F.col("counts"), (F.size("counts") / 2).cast("int") + 1)
        .cast("bigint")
        .alias("median_freq"),
        F.element_at(F.col("counts"), F.size("counts")).cast("bigint").alias("max_freq"),
        avg.alias("avg_freq"),
        sd.alias("stddev_freq"),
    )


def aggregate_descriptors(
    df: DataFrame, descriptors: list[Descriptor], uniq_cap: int | None = None
) -> DataFrame:
    """Run the full framework: returns (key, value) string rows, key = the
    aggregation id, value = the function's report string — the reference's
    reducer output (ValueAggregatorReducer.java:48)."""
    if not descriptors:
        raise ValueError("descriptors must be non-empty")
    long_df = _long_form(df, descriptors)
    funcs = {d.func for d in descriptors}
    branches: list[DataFrame] = []

    # ONE shuffle for all plain scalar functions (the reference's shape: one
    # MR job evaluates every descriptor): group on (func, id) with
    # conditional aggregates — each group carries a single func, so exactly
    # one of the agg columns is non-null and the CASE below picks it.
    # UniqValueCount is evaluated in its OWN branch: mixing a distinct
    # aggregate into this one would force Catalyst's Expand over the whole
    # long form (rows x2) just to serve the one distinct column.
    def when_func(name: str, col: Column) -> Column:
        return F.when(F.col("func") == name, col)

    scalar_funcs = funcs - {VALUE_HISTOGRAM, UNIQ_VALUE_COUNT}
    if scalar_funcs:
        num = F.col("value").cast("long")
        dbl = F.col("value").cast("double")
        scalar = (
            long_df.filter(F.col("func").isin(*scalar_funcs))
            .groupBy("func", "id")
            .agg(
                F.sum(when_func(LONG_VALUE_SUM, num)).alias("lsum"),
                F.sum(when_func(DOUBLE_VALUE_SUM, dbl)).alias("dsum"),
                F.max(when_func(LONG_VALUE_MAX, num)).alias("lmax"),
                F.min(when_func(LONG_VALUE_MIN, num)).alias("lmin"),
                F.max(when_func(STRING_VALUE_MAX, F.col("value"))).alias("smax"),
                F.min(when_func(STRING_VALUE_MIN, F.col("value"))).alias("smin"),
            )
        )
        picked = (
            F.when(F.col("func") == LONG_VALUE_SUM, F.col("lsum").cast("string"))
            .when(F.col("func") == DOUBLE_VALUE_SUM, F.col("dsum").cast("string"))
            .when(F.col("func") == LONG_VALUE_MAX, F.col("lmax").cast("string"))
            .when(F.col("func") == LONG_VALUE_MIN, F.col("lmin").cast("string"))
            .when(F.col("func") == STRING_VALUE_MAX, F.col("smax"))
            .when(F.col("func") == STRING_VALUE_MIN, F.col("smin"))
        )
        branches.append(scalar.select("id", picked.alias("value")))
    if UNIQ_VALUE_COUNT in funcs:
        uniq = (
            long_df.filter(F.col("func") == UNIQ_VALUE_COUNT)
            .groupBy("id")
            .agg(uniq_value_count(F.col("value"), uniq_cap).cast("string").alias("value"))
        )
        branches.append(uniq)
    # Plan-time pruning: only attach the histogram pipeline (two extra
    # aggregations) when a ValueHistogram descriptor is actually present.
    if VALUE_HISTOGRAM in funcs:
        hist = long_df.filter(F.col("func") == VALUE_HISTOGRAM)
        branches.append(histogram_report_df(hist.select("id", "value")))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.select(F.col("id").alias("key"), "value")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Deterministic KMV (k-minimum-values) distinct-count sketch per
    group (Bar-Yossef et al. / Beyer et al., public sketch literature):
    hash each value to md5 hex, keep the k smallest distinct hashes, and
    estimate |D| = (k-1) / frac(h_(k)) where frac maps the k-th smallest
    hash to (0,1]. With fewer than k distinct values the count is exact.

    Unlike HLL (engine-specific registers), every step here — md5, hash
    order, the fraction arithmetic — replays identically in any engine,
    so the ORACLE CHECKS THE SKETCH VALUE ITSELF, not just its shape.

    Scale: one distinct shuffle on (group, hash), then a per-group rank
    pruned to k rows by WindowGroupLimit (the sort never materializes
    beyond k per partition); at 100 TB swap the distinct for a partial
    per-partition bottom-k pre-aggregation if the value space is huge."""
    h = df.select(
        F.col(group_col), F.md5(F.col(value_col).cast("string")).alias("_h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    topk = h.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    # frac(h) from the first 13 hex digits (52 bits — exact in a double):
    # uniform in (0,1] after the +1 guard against the (impossible) all-zero
    # prefix ever yielding a zero divisor.
    frac = (F.conv(F.substring("_h", 1, 13), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(16**13)
    )
    agg = topk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(F.when(F.col("_rk") == k, frac)).alias("_kth"),
    )
    return agg.select(
        group_col,
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise(F.round((F.lit(float(k - 1))) / F.col("_kth"), 6))
        .alias("distinct_est"),
        F.col("_n").cast("int").alias("n_hashes"),
    )


def sample_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sample_id_col: str,
    s: int = 200,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Deterministic sample-based quantiles per group: rank rows by
    (md5(id), id) — a fixed random-looking order — keep the first ``s``
    per group, and take exact index quantiles of the SAMPLE (element at
    floor((n-1) * q) of the sorted sample, 0-based).

    The deterministic twin of percentile_approx: bounded memory per
    group (s values), and because the sample membership and the index
    arithmetic are engine-portable, the oracle checks the estimates
    exactly. One shuffle on the group key; the rank is
    WindowGroupLimit-pruned to s rows per group."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(sample_id_col).cast("string")), F.col(sample_id_col)
    )
    sample = (
        df.select(group_col, value_col, F.col(sample_id_col))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= s)
    )
    vals = sample.groupBy(group_col).agg(
        F.sort_array(F.collect_list(F.col(value_col).cast("double"))).alias("_v")
    )
    cols = [F.col(group_col)]
    for q in qs:
        idx = F.floor((F.size("_v") - 1) * F.lit(q)).cast("int") + 1  # 1-based
        cols.append(
            F.round(F.element_at("_v", idx), 6).alias(f"p{int(q * 100)}")
        )
    return vals.select(*cols)


def kmv_set_estimates(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV set algebra (Beyer et al. 2007, §4): pairwise union and
    intersection cardinality estimates between every two groups, read
    off the groups' bottom-k hash sketches — no pass over the data
    beyond the one distinct shuffle that builds the sketches.

    For a pair (A, B): K(A∪B) = bottom-k of K(A) ∪ K(B), so
    |A∪B| ≈ (k-1)/frac(h_(k)) on the merged set, and with
    ρ = |{h ∈ bottom-k(merged): h ∈ K(A) ∩ K(B)}| / k,
    |A∩B| ≈ ρ · |A∪B|. When the merged set has fewer than k hashes both
    input sketches were complete, so union and intersection are EXACT.

    Everything after the sketch build is bounded: groups·k rows, then
    pairs·k — planner-scale relations no matter the data volume (the
    same role the CMS join-cardinality estimator plays, with set
    semantics instead of multiset). md5-deterministic end to end, so the
    oracle checks the ESTIMATES themselves."""
    from hadoop_1_spark.operators.caching import persist_tracked

    h = df.select(
        F.col(group_col).alias("_g"),
        F.md5(F.col(value_col).cast("string")).alias("_h"),
    ).distinct()
    w = Window.partitionBy("_g").orderBy("_h")
    topk = persist_tracked(
        h.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k).drop("_rk")
    )
    groups = topk.select("_g").distinct()
    # bounded pair table (|groups|^2 rows) — the tiny labeled cross join
    pairs = (
        groups.select(F.col("_g").alias("g1"))
        .crossJoin(groups.select(F.col("_g").alias("g2")))
        .where(F.col("g1") < F.col("g2"))
    )
    e1 = topk.join(F.broadcast(pairs), topk["_g"] == pairs["g1"]).select(
        "g1", "g2", "_h", F.lit(1).alias("_a"), F.lit(0).alias("_b")
    )
    e2 = topk.join(F.broadcast(pairs), topk["_g"] == pairs["g2"]).select(
        "g1", "g2", "_h", F.lit(0).alias("_a"), F.lit(1).alias("_b")
    )
    merged = (
        e1.unionByName(e2)
        .groupBy("g1", "g2", "_h")
        .agg(F.max("_a").alias("_ina"), F.max("_b").alias("_inb"))
    )
    wm = Window.partitionBy("g1", "g2").orderBy("_h")
    frac = (
        F.conv(F.substring("_h", 1, 13), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(16**13))
    r = merged.withColumn("_rk", F.row_number().over(wm))
    stats = r.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).alias("_total"),
        F.max(F.when(F.col("_rk") == k, frac)).alias("_kth"),
        F.sum(
            F.when(
                (F.col("_rk") <= k) & (F.col("_ina") == 1) & (F.col("_inb") == 1), 1
            ).otherwise(0)
        ).alias("_both"),
    )
    exact = F.col("_total") < k
    union_est = F.when(exact, F.col("_total").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / F.col("_kth"), 6)
    )
    inter_est = F.when(exact, F.col("_both").cast("double")).otherwise(
        F.round(
            F.col("_both") * F.lit(float(k - 1)) / (F.lit(float(k)) * F.col("_kth")),
            6,
        )
    )
    return stats.select(
        F.col("g1").alias("type_a"),
        F.col("g2").alias("type_b"),
        union_est.alias("union_est"),
        inter_est.alias("inter_est"),
        F.col("_both").cast("int").alias("n_common_hashes"),
    )


def merge_aggregate_snapshots(
    snapshot: DataFrame,
    delta: DataFrame,
    key_cols: tuple[str, ...],
    sum_cols: tuple[str, ...],
) -> DataFrame:
    """Incremental materialized-view maintenance for re-aggregatable
    (commutative-monoid) aggregates: fold a delta batch's partial
    aggregate into the parked snapshot with one union + re-sum — the
    refresh never touches the base data again (the cms_merge /
    signature-store parking pattern applied to plain aggregates).

    Correctness contract: merge(agg(A), agg(B)) == agg(A ∪ B) for sums
    and counts — the registered query's oracle IS the full recompute,
    so the identity itself is what gets hash-checked every round.

    Scale: the shuffle carries only the two aggregate relations (keys x
    partial sums), never base rows; at 100 TB the snapshot stays
    key-bounded and each refresh costs one delta scan + a key-sized
    merge."""
    merged = snapshot.select(*key_cols, *sum_cols).unionByName(
        delta.select(*key_cols, *sum_cols)
    )
    return merged.groupBy(*key_cols).agg(
        *[F.sum(c).cast("bigint").alias(c) for c in sum_cols]
    )


def hll_estimate_col(sum_inv: Column, m: int = 256) -> Column:
    """Raw HLL estimate alpha_m * m^2 * 2^41 / S as a Column — the ONE
    place the estimate constants live (batch hll_distinct and the
    streaming twin both call it; the oracle SQL writes the identical
    literal expression). alpha_m for m >= 128 (Flajolet et al. §4);
    IEEE double ops in a fixed order are engine-identical."""
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    return (
        F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(1 << 41))
        / sum_inv.cast("double")
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count sketch per group
    (Flajolet et al. 2007), built so every step replays in portable SQL
    — the register-exact sibling of kmv_distinct, closing the sketch
    family triple (KMV / CMS / HLL). The reference's UniqValueCount
    (mapred/lib/aggregate/UniqValueCount.java:30) answers the same
    question with an unbounded in-memory set; HLL answers it with
    2^p registers.

    Portability contract (why this is oracle-checkable when stock HLL
    implementations are not):
    - hash = md5 hex (identical in Spark and DuckDB), register index =
      top ``p`` bits, rank input ``w`` = the NEXT 40 bits only;
    - rho(w) = 41 - bitlength(w) (bitlength via the engines' shared
      ``bin()`` string length; w = 0 -> rho = 41);
    - the harmonic denominator sum(2^-M_j) is kept EXACT as the integer
      S = sum_j 2^(41 - M_j) (absent registers contribute 2^41): with
      m = 256 registers, S <= 256 * 2^41 = 2^49 < 2^53, so the bigint
      is exact, its double cast is exact, and the one double division
      in the estimate is IEEE-identical across engines.

    The raw estimate alpha_m * m^2 * 2^41 / S is emitted uncorrected,
    plus the zero-register count and a ``small_range`` flag: the
    standard linear-counting correction needs ln(), which is libm- and
    engine-specific, so it is a documented consumer-side step (the same
    honesty rule as uniq_count_approx's rows-only check).

    Scale: ONE aggregation on (group, register) — partial aggregation
    bounds map-side state at m rows per group, and the shuffle carries
    at most m rows per group per partition regardless of cardinality —
    then an m-bounded per-group fold. This is the 100 TB shape: no
    distinct materialization, no tail shuffle (contrast kmv_distinct's
    distinct-hash shuffle, which carries every unique value once)."""
    if p != 8:
        raise ValueError("portable hll_distinct is pinned to p=8 (256 registers)")
    m = 1 << p
    h = F.md5(F.col(value_col).cast("string"))
    idx = F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint")
    w = F.conv(F.substring(h, 3, 10), 16, 10).cast("bigint")
    rho = F.when(w == 0, F.lit(41)).otherwise(F.lit(41) - F.length(F.bin(w)))
    regs = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col), idx.alias("_idx"), rho.alias("_rho"))
        .groupBy(group_col, "_idx")
        .agg(F.max("_rho").alias("_m"))
    )
    sk = regs.groupBy(group_col).agg(
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 41 - _m)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << 41)
        )
        .cast("bigint")
        .alias("sum_inv"),
        (F.lit(m) - F.count(F.lit(1))).cast("int").alias("v_zero"),
    )
    est = hll_estimate_col(F.col("sum_inv"), m)
    return sk.select(
        group_col,
        F.round(est, 6).alias("hll_est"),
        "sum_inv",
        "v_zero",
        ((est <= F.lit(2.5 * m)) & (F.col("v_zero") > 0)).alias("small_range"),
    )


def linear_trend(
    df: DataFrame,
    group_col: str,
    x: Column,
    y_q6: Column,
) -> DataFrame:
    """Per-group ordinary-least-squares slope in EXACT scaled-integer
    arithmetic — the trend/drift observability primitive (metric slope
    per segment, data-freshness decay) with none of float OLS's
    order-dependence.

    Inputs: integer regressor ``x`` (e.g. epoch days) and micro-scaled
    integer response ``y_q6`` (value * 10^6). All five sufficient
    statistics (n, Sx, Sy, Sxy, Sxx) accumulate as DECIMAL(38,0) —
    commutative, overflow-checked, engine-identical — and the slope
    ships as ``slope_q6 = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` in
    TRUNCATE-TOWARD-ZERO integer division — Spark's decimal ``div``
    truncates, and the oracle divides as HUGEINT (int128), which also
    truncates; DECIMAL ``//`` in DuckDB ROUNDS and must not be used. The numerator and
    denominator are also emitted as decimal strings: consumers needing
    more precision re-divide exactly.

    One partial-aggregated shuffle on the group key; five sums per
    group — the classic sufficient-statistics shape that scales to any
    row count. Groups with a degenerate x (all equal -> den = 0) emit
    NULL slope."""
    d38 = "decimal(38,0)"
    rows = df.select(
        F.col(group_col),
        x.cast("bigint").alias("_x"),
        y_q6.cast("bigint").alias("_y"),
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    s = rows.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_x").cast(d38)).cast(d38).alias("_sx"),
        F.sum(F.col("_y").cast(d38)).cast(d38).alias("_sy"),
        F.sum((F.col("_x").cast(d38) * F.col("_y").cast(d38)).cast(d38))
        .cast(d38).alias("_sxy"),
        F.sum((F.col("_x").cast(d38) * F.col("_x").cast(d38)).cast(d38))
        .cast(d38).alias("_sxx"),
    )
    num = (F.col("n").cast(d38) * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(d38)
    den = (F.col("n").cast(d38) * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(d38)
    tz_div = F.when(den == 0, F.lit(None).cast("bigint")).otherwise(
        F.expr("_num div _den").cast("bigint")
    )
    return (
        s.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            group_col,
            "n",
            F.col("_num").cast("string").alias("num"),
            F.col("_den").cast("string").alias("den"),
            tz_div.alias("slope_q6"),
        )
    )


CHI2_CRIT_Q6 = 3841459  # chi-square 0.05 critical value (1 dof), micro-units


def ab_test_report(
    events: DataFrame,
    unit_col: str = "user_id",
    event_type_col: str = "event_type",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Two-variant experiment readout with an EXACT chi-square independence
    test — the experimentation-analysis primitive (conversion lift +
    significance) with no float accumulation anywhere.

    Unit = distinct ``unit_col``; assignment is the deterministic md5
    split (sampling.md5_mod(unit, 2): 0 -> 'A', 1 -> 'B' — the same
    portable bucket arithmetic as corpus_split, so any engine reproduces
    the same arms); a unit converts if it has >= 1 ``conversion_type``
    event. One row out:

    - users_a/conv_a/users_b/conv_b — the exact 2x2 contingency counts
    - cr_a_q6/cr_b_q6 — conversion rates, micro-scaled floor division
    - chi2_q6 — N*(ad-bc)^2*10^6 div ((a+b)(c+d)(a+c)(b+d)) in
      DECIMAL(38,0) (truncate == floor: every term nonnegative); NULL
      when any margin is empty (the test is undefined).
    - significant — chi2 > 3.841459 (95%, 1 dof) decided by CROSS-
      MULTIPLICATION on the exact integers, so the flag never depends
      on the q6 truncation.

    Plan: one shuffle on the unit key (map-side partial max), then a
    single global aggregation of four counts — sufficient-statistics
    shape, scales to any event volume. Exactness bound: the binding term
    is N*(ad-bc)^2*10^6 < 10^38 (DECIMAL(38,0)/HUGEINT headroom); with u
    units per arm the worst case |ad-bc| <= u^2 gives 2u^5*10^6 < 10^38,
    i.e. u <~ 2*10^6 units per arm guaranteed, far more in practice
    (|ad-bc| ~ u^2 requires a near-total conversion split). Past that,
    pre-divide all four counts by a common factor before the test —
    chi-square is scale-covariant (chi2 scales linearly with the
    factor), so the significance decision needs the comparison rescaled
    by the same factor, and the rates stay exact on the raw counts."""
    from hadoop_1_spark.operators.sampling import md5_mod

    units = (
        events.where(F.col(unit_col).isNotNull())
        .groupBy(unit_col)
        .agg(
            F.max(
                F.when(F.col(event_type_col) == conversion_type, 1).otherwise(0)
            ).alias("_conv")
        )
        .select(
            F.when(md5_mod(F.col(unit_col), 2) == 0, "A").otherwise("B").alias("_v"),
            "_conv",
        )
    )
    g = units.groupBy().agg(
        F.sum(F.when(F.col("_v") == "A", 1).otherwise(0)).cast("bigint").alias("users_a"),
        F.sum(F.when(F.col("_v") == "A", F.col("_conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("_v") == "B", 1).otherwise(0)).cast("bigint").alias("users_b"),
        F.sum(F.when(F.col("_v") == "B", F.col("_conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    d38 = "decimal(38,0)"
    w = (
        g.withColumn("_n", (F.col("users_a") + F.col("users_b")).cast(d38))
        .withColumn(
            "_adbc",
            (
                F.col("conv_a").cast(d38) * (F.col("users_b") - F.col("conv_b")).cast(d38)
                - (F.col("users_a") - F.col("conv_a")).cast(d38) * F.col("conv_b").cast(d38)
            ).cast(d38),
        )
        .withColumn(
            "_den",
            (
                F.col("users_a").cast(d38)
                * F.col("users_b").cast(d38)
                * (F.col("conv_a") + F.col("conv_b")).cast(d38)
                * (
                    F.col("users_a")
                    + F.col("users_b")
                    - F.col("conv_a")
                    - F.col("conv_b")
                ).cast(d38)
            ).cast(d38),
        )
        .withColumn(
            "_num", (F.col("_n") * F.col("_adbc") * F.col("_adbc")).cast(d38)
        )
    )
    return w.select(
        "users_a",
        "conv_a",
        "users_b",
        "conv_b",
        F.when(
            F.col("users_a") > 0,
            F.expr(f"CAST(conv_a AS {d38}) * 1000000 div CAST(users_a AS {d38})"),
        )
        .cast("bigint")
        .alias("cr_a_q6"),
        F.when(
            F.col("users_b") > 0,
            F.expr(f"CAST(conv_b AS {d38}) * 1000000 div CAST(users_b AS {d38})"),
        )
        .cast("bigint")
        .alias("cr_b_q6"),
        F.when(F.col("_den") > 0, F.expr("(_num * 1000000) div _den"))
        .cast("bigint")
        .alias("chi2_q6"),
        (
            (F.col("_den") > 0)
            & (F.col("_num") * F.lit(1000000).cast(d38) > F.lit(CHI2_CRIT_Q6).cast(d38) * F.col("_den"))
        ).alias("significant"),
    )


def mann_whitney_auc(
    scored: DataFrame, score_col: str = "qq", label_col: str = "y"
) -> DataFrame:
    """EXACT ROC AUC via the Mann-Whitney rank identity — the third leg of
    the classifier-eval family (kappa: agreement; PR curve: thresholded
    operating points; AUC: threshold-free ranking quality).

    AUC = P(score_pos > score_neg) + P(tie)/2. Per distinct score s with
    pos(s) positives and neg(s) negatives, doubling to stay integral:

        num2 = sum_s pos(s) * (2*neg_below(s) + neg(s)),  AUC = num2/(2*P*N)

    Plan: collapse the corpus to per-distinct-score counts (bounded by
    the q6 score domain, not the corpus — the PR-curve precedent), run
    ONE distributed prefix scan (sort.global_prefix_sum: range shuffle +
    Arrow running sum + broadcast offsets — no single-partition window
    at any score cardinality) for the cumulative negatives, then a 1-row
    exact aggregation. ``num2`` also ships as a decimal string for
    consumers needing the unreduced rational. Int64 scan bound: the
    cumulative negative count is at most N (fits trivially); the final
    sum accumulates in DECIMAL(38,0). Degenerate inputs (no positives or
    no negatives) yield NULL — AUC is undefined, never 0/0."""
    from hadoop_1_spark.operators.sort import global_prefix_sum

    agg_counts = scored.groupBy(score_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(label_col).cast("bigint").alias("_pos"),
    )
    with_neg = agg_counts.select(
        F.col(score_col), "_pos", (F.col("_n") - F.col("_pos")).alias("_neg")
    )
    cum = global_prefix_sum(with_neg, score_col, value_col="_neg", out_col="_cum_neg")
    d38 = "decimal(38,0)"
    tot = cum.agg(
        F.sum("_pos").cast("bigint").alias("n_pos"),
        F.sum("_neg").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("_pos").cast(d38)
            * (F.lit(2).cast(d38) * F.col("_cum_neg").cast(d38) - F.col("_neg").cast(d38))
        )
        .cast(d38)
        .alias("_num2"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        F.col("_num2").cast("string").alias("auc_num2"),
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0), F.lit(None).cast("bigint")
        )
        .otherwise(
            F.expr(
                f"(_num2 * cast(1000000 as {d38})) div"
                f" (cast(2 as {d38}) * cast(n_pos as {d38}) * cast(n_neg as {d38}))"
            ).cast("bigint")
        )
        .alias("auc_q6"),
    )


def winsorize_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: int = 1,
    p_hi: int = 99,
) -> DataFrame:
    """EXACT winsorization (percentile clipping) report per group — the
    outlier-taming step of feature preprocessing, computed on the
    repo-wide q6 integer grid with the collapsed-value rank scan (the
    equidepth/CDF machinery), no approximate percentiles anywhere.

    Boundary rule: the p-th percentile is the SMALLEST distinct value
    whose cumulative count satisfies cum*100 >= n*p (exact
    cross-multiplication — no float division); lo = p_lo-th, hi =
    p_hi-th. Per group the report ships n, the exact q6 boundaries,
    the clipped-row counts on each side, and the winsorized sum
    sum(clamp(v, lo, hi)) as a DECIMAL STRING (a q6 value sum passes
    2^53 at web scale; the decimal-string rule from the registry
    contract).

    Shape at 100 TB: the corpus collapses to per-(group, distinct-q6)
    counts FIRST (map-side combine), so the rank windows and the
    boundary join run over the collapsed relation, never rows. One
    row-level shuffle (the collapse), bounded everything after."""
    from pyspark.sql.window import Window

    q = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col),
        F.floor(F.col(value_col).cast("double") * 1000000)
        .cast("bigint")
        .alias("_vq"),
    )
    per = q.groupBy(group_col, "_vq").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("_vq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    c = per.select(
        group_col,
        "_vq",
        "_c",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    b = c.groupBy(group_col).agg(
        F.min(F.when(F.col("_cum") * 100 >= F.col("_n") * p_lo, F.col("_vq"))).alias("_lo"),
        F.min(F.when(F.col("_cum") * 100 >= F.col("_n") * p_hi, F.col("_vq"))).alias("_hi"),
        F.max("_n").alias("_gn"),
    )
    j = per.join(b, group_col)
    d38 = "decimal(38,0)"
    return j.groupBy(group_col).agg(
        F.max("_gn").cast("bigint").alias("n"),
        F.max("_lo").cast("bigint").alias("lo_q6"),
        F.max("_hi").cast("bigint").alias("hi_q6"),
        F.sum(F.when(F.col("_vq") < F.col("_lo"), F.col("_c")).otherwise(0))
        .cast("bigint")
        .alias("n_clip_lo"),
        F.sum(F.when(F.col("_vq") > F.col("_hi"), F.col("_c")).otherwise(0))
        .cast("bigint")
        .alias("n_clip_hi"),
        F.sum(
            F.expr(
                f"CAST(greatest(least(_vq, _hi), _lo) AS {d38}) * CAST(_c AS {d38})"
            )
        )
        .cast(d38)
        .cast("string")
        .alias("winsorized_sum_q6"),
    )
