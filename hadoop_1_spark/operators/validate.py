"""Declarative data-quality validation (the Deequ/expectations idea,
public practice): a constraint list compiled into ONE aggregation pass,
returning a (constraint, observed_q6, passed) report.

Reference anchor: the aggregate-descriptor framework
(mapred/lib/aggregate/ValueAggregatorBaseDescriptor.java:84 — many named
aggregations from one scan); validation is that framework pointed at
invariants instead of metrics, plus an anti-join for referential
integrity (the data_join semi-join idiom).

Scale notes (100 TB design intent):
- every row-local constraint (completeness, range, set membership,
  regex) folds into a single map-side-combined aggregation — ONE scan,
  no shuffle beyond the 1-row aggregate, regardless of how many
  constraints are declared.
- uniqueness needs a keyed distinct — one shuffle on the key columns.
- referential integrity is a broadcast/shuffle anti-join on the foreign
  key (AQE picks the side).
- observed values are exact integer q6 fractions, so reports replay
  bit-for-bit in the oracle and never drift between engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One constraint: ``name``; ``predicate`` (row-level boolean Column);
    ``min_pass_q6`` — the fraction of rows (q6) that must satisfy it
    (1_000_000 = every row)."""

    name: str
    predicate: Column
    min_pass_q6: int = 1_000_000


def _report(name: Column, observed: Column, threshold: Column) -> list[Column]:
    return [
        name.alias("constraint"),
        observed.cast("bigint").alias("observed_q6"),
        (observed >= threshold).alias("passed"),
    ]


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Compile row-level checks into ONE aggregation: each check becomes
    a conditional count; observed_q6 = (satisfied * 10^6) div rows.
    Empty input: every check reports observed_q6 = 10^6 (vacuous pass)."""
    if not checks:
        raise ValueError("run_checks: the checks list is empty")
    aggs = [F.count(F.lit(1)).alias("_rows")] + [
        F.count(F.when(c.predicate, 1)).alias(f"_c{i}")
        for i, c in enumerate(checks)
    ]
    row = df.agg(*aggs)
    out = None
    for i, c in enumerate(checks):
        observed = F.expr(
            f"if(_rows = 0, 1000000, (_c{i} * 1000000) div _rows)"
        )
        part = row.select(
            *_report(F.lit(c.name), observed, F.lit(c.min_pass_q6))
        )
        out = part if out is None else out.unionByName(part)
    return out


def uniqueness_check(
    df: DataFrame, key_cols: tuple[str, ...], name: str | None = None
) -> DataFrame:
    """distinct(keys) == rows, reported as a q6 ratio (keyed shuffle)."""
    name = name or ("unique(" + ",".join(key_cols) + ")")
    row = df.agg(
        F.count(F.lit(1)).alias("_rows"),
        F.count_distinct(*[F.col(k) for k in key_cols]).alias("_d"),
    )
    observed = F.expr("if(_rows = 0, 1000000, (_d * 1000000) div _rows)")
    return row.select(*_report(F.lit(name), observed, F.lit(1_000_000)))


def referential_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Every child FK resolves to a parent PK: anti-join orphan count,
    reported as the q6 fraction of RESOLVED rows."""
    name = name or f"fk({child_key}->{parent_key})"
    total = child.agg(F.count(F.lit(1)).alias("_rows"))
    orphans = (
        child.select(F.col(child_key))
        .join(
            parent.select(F.col(parent_key).alias(child_key)),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    row = total.crossJoin(orphans)
    observed = F.expr("if(_rows = 0, 1000000, ((_rows - _o) * 1000000) div _rows)")
    return row.select(*_report(F.lit(name), observed, F.lit(1_000_000)))


def profile_table(
    df: DataFrame,
    num_cols: tuple[str, ...] = (),
    str_cols: tuple[str, ...] = (),
    ts_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Column-profiling report (the Deequ/pandas-profiling artifact a
    pipeline runs before trusting a new drop): long-form rows
    (col_name, metric, value) covering completeness (q6), exact distinct
    counts, numeric/timestamp min-max, and each string column's modal
    value share (q6). Numeric values travel as DOUBLE; string metrics
    ride a separate value_str column (NULL elsewhere) so one relation
    carries the whole profile.

    Shape: ONE aggregation pass computes every completeness/min/max and
    all exact distincts (Catalyst expands multi-distinct into one
    Expand + aggregation — still a single scan); each string column
    adds one wordcount-shaped shuffle for its modal value. Timestamps
    profile as epoch micros (exact integers < 2^53, so the DOUBLE
    carriage is lossless and engine-portable)."""
    if not (num_cols or str_cols or ts_cols):
        raise ValueError("profile_table: no columns declared")
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for c in (*num_cols, *str_cols, *ts_cols):
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_d_{c}"))
    for c in num_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
    for c in ts_cols:
        aggs.append(F.min(F.unix_micros(F.col(c))).cast("double").alias(f"_mn_{c}"))
        aggs.append(F.max(F.unix_micros(F.col(c))).cast("double").alias(f"_mx_{c}"))
    row = df.agg(*aggs)

    # r15 (guide §2.4 + py4j chatter): the single-row metrics used to be
    # ~18 separate 1-row selects chained through unionByName — ~15 driver
    # calls and one plan branch EACH. One stack() over the same 1-row
    # aggregate emits every (col, metric) row in one Project+Generate:
    # identical values (same expressions, same double casts; row ORDER
    # within the relation is not part of any contract — the oracle and
    # driver compare sorted), far smaller plan.
    def q(ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    entries: list[tuple[str, str, str]] = []
    for c in (*num_cols, *str_cols, *ts_cols):
        entries.append(
            (lit(c), lit("completeness_q6"),
             f"cast(if(_rows = 0, 1000000,"
             f" ({q('_nn_' + c)} * 1000000) div _rows) as double)")
        )
        entries.append((lit(c), lit("distinct"), f"cast({q('_d_' + c)} as double)"))
    for c in (*num_cols, *ts_cols):
        entries.append((lit(c), lit("min"), f"cast({q('_mn_' + c)} as double)"))
        entries.append((lit(c), lit("max"), f"cast({q('_mx_' + c)} as double)"))
    stack_args = ", ".join(
        f"{n}, {m}, {v}, cast(null as string)" for n, m, v in entries
    )
    parts: list[DataFrame] = [
        row.selectExpr(
            f"stack({len(entries)}, {stack_args})"
            " as (col_name, metric, value_num, value_str)"
        )
    ]
    for c in str_cols:
        counts = df.groupBy(F.col(c)).agg(F.count(F.lit(1)).alias("_cnt"))
        top = counts.orderBy(F.desc("_cnt"), F.asc(c)).limit(1)
        parts.append(
            top.crossJoin(F.broadcast(row.select("_rows"))).select(
                F.lit(c).alias("col_name"),
                F.lit("top_share_q6").alias("metric"),
                F.expr("if(_rows = 0, 0, (_cnt * 1000000) div _rows)")
                .cast("double")
                .alias("value_num"),
                F.col(c).cast("string").alias("value_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


KS_CRIT_SQ_Q6 = 1844164  # (1.358)^2 * 10^6 — two-sample KS alpha=0.05 coefficient


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    g1: str,
    g2: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov drift test between the
    ``value_col`` distributions of two groups — the distribution-drift
    monitor (train-vs-serve skew, week-over-week shift) in pure integer
    arithmetic.

    D = sup_x |F1(x) - F2(x)| evaluated after each distinct sample value.
    With per-distinct-value counts c1, c2 and totals n1, n2, the signed
    step c1(v)*n2 - c2(v)*n1 has cumulative sum cum(v) = F1-F2 scaled by
    n1*n2 — so ONE distributed prefix scan (sort.global_prefix_sum) over
    the collapsed value relation yields the whole CDF-difference walk,
    and D = max |cum| / (n1*n2). Values collapse to q6 integers first
    (floor(v*10^6) — the repo-wide exact-grid convention).

    Output (1 row): n1, n2, the exact numerator d_num = max|cum|, the
    value attaining it (smallest such, deterministic), ks_q6 =
    (d_num*10^6) div (n1*n2), and ``drifted`` — the alpha=0.05 call
    decided by CROSS-MULTIPLICATION against c(0.05)=1.358, in the
    divided form d_num^2 > (1.358^2*10^6 * (n1+n2) * n1 * n2) div 10^6,
    which for positive integers is EXACTLY equivalent to the textbook
    d_num^2 * 10^6 > crit * (n1+n2) * n1 * n2 (a*m > X <=> a > X div m)
    but keeps every DECIMAL(38,0) term within headroom over the whole
    int64 scan range: d_num <= n1*n2 < 2^63 gives d_num^2 < 10^38
    (the multiplied form would need 10^44 and silently NULL the flag).
    The flag never touches a float or the q6 truncation.

    Int64 scan bound: |cum| <= n1*n2, so the prefix scan is exact while
    n1*n2 < 2^63 (~3*10^9 rows per side); past that, pre-bucket values
    to a coarser grid (KS on binned data lower-bounds D) or scale counts
    down by a common factor. The top-1 selection is a TakeOrdered over
    the bounded distinct-value relation, not a global sort."""
    q = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isin(g1, g2)
    ).select(
        F.floor(F.col(value_col) * 1000000).cast("bigint").alias("vq"),
        F.when(F.col(group_col) == g1, F.lit(1)).otherwise(F.lit(0)).alias("_is1"),
    )
    per = q.groupBy("vq").agg(
        F.sum("_is1").cast("bigint").alias("_c1"),
        F.sum(F.lit(1) - F.col("_is1")).cast("bigint").alias("_c2"),
    )
    from hadoop_1_spark.operators.caching import persist_tracked

    per = persist_tracked(per)
    tot = per.agg(
        F.sum("_c1").cast("bigint").alias("n1"),
        F.sum("_c2").cast("bigint").alias("n2"),
    )
    step = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "vq",
            (F.col("_c1") * F.col("n2") - F.col("_c2") * F.col("n1"))
            .cast("bigint")
            .alias("_step"),
        )
    )
    from hadoop_1_spark.operators.sort import global_prefix_sum

    cum = global_prefix_sum(step, "vq", value_col="_step", out_col="_cum")
    best = (
        cum.select("vq", F.abs(F.col("_cum")).alias("_d"))
        .orderBy(F.desc("_d"), F.asc("vq"))
        .limit(1)
    )
    d38 = "decimal(38,0)"
    return (
        best.crossJoin(F.broadcast(tot))
        .select(
            "n1",
            "n2",
            F.col("_d").alias("d_num"),
            F.col("vq").alias("at_value_q6"),
            F.when(
                (F.col("n1") == 0) | (F.col("n2") == 0), F.lit(None).cast("bigint")
            )
            .otherwise(
                F.expr(
                    f"(cast(_d as {d38}) * cast(1000000 as {d38}))"
                    f" div (cast(n1 as {d38}) * cast(n2 as {d38}))"
                ).cast("bigint")
            )
            .alias("ks_q6"),
            (
                (F.col("n1") > 0)
                & (F.col("n2") > 0)
                & (
                    F.expr(f"cast(_d as {d38}) * cast(_d as {d38})")
                    > F.expr(
                        f"(cast({KS_CRIT_SQ_Q6} as {d38})"
                        f" * (cast(n1 as {d38}) + cast(n2 as {d38}))"
                        f" * cast(n1 as {d38}) * cast(n2 as {d38}))"
                        f" div cast(1000000 as {d38})"
                    )
                )
            ).alias("drifted"),
        )
    )


def pearson_corr(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation report over a numeric column list —
    the feature-correlation screen (redundant-feature and leakage
    detection) run before any model training, computed from EXACT
    integer sufficient statistics in one scan.

    Values quantize to the repo-wide q6 grid (floor(v*10^6) — identical
    for the same double in any engine), rows with a NULL in ANY listed
    column are dropped first (listwise deletion, so every pair shares
    one n and the report is a true correlation MATRIX, not pairwise-
    complete patchwork). One aggregation computes count, per-column
    sums, and all pairwise product sums as DECIMAL(38,0) — exact; the
    single 1-row result then unrolls to one row per (col_x, col_y) pair
    via stack(), so the corpus is scanned ONCE no matter how many pairs
    are reported.

    Output per pair: n, the exact centered moments as DECIMAL STRINGS
    (num = n*Sxy - Sx*Sy, dx = n*Sxx - Sx^2, dy = n*Syy - Sy^2 — the
    full-precision evidence, engine-identical text), and r_q9 =
    round(num / sqrt(dx*dy), 9) where every float op (decimal->double
    conversion, multiply, sqrt, divide) is IEEE correctly-rounded in
    both engines — the same one-double-division contract as the HLL
    estimator. r_q9 is NULL when a variance is zero (constant column)
    or n = 0.

    Exactness bound: per-row products are <= (10^6*|v|_max)^2; with
    price-scale values (~10^5 -> q6 ~10^11) the product sum reaches
    ~10^22 per row, so DECIMAL(38,0) holds ~10^16 rows — comfortably
    past a 100 TB lineitem. Shape at 100 TB: one scan, map-side partial
    aggregation, a 1-row exchange — nothing else."""
    if len(cols) < 2:
        raise ValueError("pearson_corr needs at least two columns")
    d38 = "decimal(38,0)"
    pred = None
    for c in cols:
        p = F.col(c).isNotNull()
        pred = p if pred is None else (pred & p)
    q = df.where(pred).select(
        *[
            F.floor(F.col(c).cast("double") * 1000000)
            .cast("bigint")
            .alias(f"_q_{c}")
            for c in cols
        ]
    )
    aggs = [F.count(F.lit(1)).cast(d38).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(f"_q_{c}").cast(d38)).cast(d38).alias(f"_s_{c}"))
    for i, c1 in enumerate(cols):
        for c2 in cols[i:]:
            aggs.append(
                F.sum(F.col(f"_q_{c1}").cast(d38) * F.col(f"_q_{c2}").cast(d38))
                .cast(d38)
                .alias(f"_p_{c1}_{c2}")
            )
    one = q.agg(*aggs)
    rows = []
    for i, c1 in enumerate(cols):
        for c2 in cols[i + 1 :]:
            rows.append(
                f"('{c1}', '{c2}',"
                f" _n * _p_{c1}_{c2} - _s_{c1} * _s_{c2},"
                f" _n * _p_{c1}_{c1} - _s_{c1} * _s_{c1},"
                f" _n * _p_{c2}_{c2} - _s_{c2} * _s_{c2})"
            )
    stacked = one.select(
        F.col("_n"),
        F.expr(
            f"stack({len(rows)}, "
            + ", ".join(r[1:-1] for r in rows)
            + ") AS (col_x, col_y, _num, _dx, _dy)"
        ),
    )
    return stacked.select(
        "col_x",
        "col_y",
        F.col("_n").cast("bigint").alias("n"),
        F.col("_num").cast("string").alias("num_str"),
        F.col("_dx").cast("string").alias("dx_str"),
        F.col("_dy").cast("string").alias("dy_str"),
        F.when(
            (F.col("_n") > 0) & (F.col("_dx") > 0) & (F.col("_dy") > 0),
            F.round(
                F.col("_num").cast("double")
                / F.sqrt(F.col("_dx").cast("double") * F.col("_dy").cast("double")),
                9,
            ),
        ).alias("r_q9"),
    )
