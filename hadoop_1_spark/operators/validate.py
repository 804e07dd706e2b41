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

    def rep(col: str, metric: str, num: Column, s: Column | None = None) -> DataFrame:
        return row.select(
            F.lit(col).alias("col_name"),
            F.lit(metric).alias("metric"),
            num.cast("double").alias("value_num"),
            (s if s is not None else F.lit(None).cast("string")).alias("value_str"),
        )

    parts: list[DataFrame] = []
    for c in (*num_cols, *str_cols, *ts_cols):
        parts.append(
            rep(c, "completeness_q6",
                F.expr(f"if(_rows = 0, 1000000, (_nn_{c} * 1000000) div _rows)"))
        )
        parts.append(rep(c, "distinct", F.col(f"_d_{c}")))
    for c in (*num_cols, *ts_cols):
        parts.append(rep(c, "min", F.col(f"_mn_{c}")))
        parts.append(rep(c, "max", F.col(f"_mx_{c}")))
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
