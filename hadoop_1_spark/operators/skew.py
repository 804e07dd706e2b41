"""Skew mitigation: salted two-stage aggregation.

At 100 TB a handful of hot keys (stop-words in wordcount, null-ish join
keys) can pin one reducer — the classic MapReduce straggler the reference
can only address by hand-tuning partitioners. Two declarative answers in
this engine:

- AQE skew handling (on by default, session.py) for joins;
- salted two-stage aggregation here for aggregations whose per-key state
  is re-aggregatable (sum/count/min/max): stage 1 aggregates on
  (key, salt) spreading each hot key over `salt_n` reducers; stage 2
  combines the salt shards. Result is identical to the direct groupBy for
  any commutative re-aggregation; cost is one extra (small) shuffle.

The salt must be deterministic for oracle checks — derived from a row
fingerprint, not rand().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    salt_n: int,
    salt_src: Column,
    partials: list[tuple[str, Callable[[str], Column], Callable[[str], Column]]],
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    partials: list of (out_name, stage1_agg(col_name)->Column,
    stage2_reagg(col_name)->Column); stage1 runs on (key, salt), stage2
    re-combines per key. Example for count:
    ("cnt", lambda c: F.count("*"), lambda c: F.sum(c))."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_n)))
    stage1 = salted.groupBy(key, "_salt").agg(
        *[s1(name).alias(name) for name, s1, _ in partials]
    )
    return stage1.groupBy(key).agg(
        *[s2(name).alias(name) for name, _, s2 in partials]
    )
