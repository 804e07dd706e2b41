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
