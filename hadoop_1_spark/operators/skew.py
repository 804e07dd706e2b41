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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_n: int,
    salt_src: Column,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side ``salt_n`` times and
    salt the big side deterministically, so a hot key's rows spread over
    ``salt_n`` reducers instead of pinning one. Result is row-identical
    to ``big.join(small, big_key == small_key, how)`` for inner/left
    joins: each big row carries exactly one salt and meets exactly the
    one replica with that salt.

    This is the hand-rolled form of what AQE skew-join splitting does at
    runtime (session.py enables it); it remains necessary when the skew
    is in an AGGREGATION feeding the join, when AQE's size thresholds
    miss the hot key, or on engines/stages where AQE cannot re-plan
    (e.g. a skewed build inside a cached relation). Cost: small side
    shuffles salt_n× its size; big side cost unchanged (the salt is a
    narrow projection).

    ``salt_src`` must be deterministic per row (a row fingerprint — the
    salted_aggregate contract), never rand(): reruns and oracle checks
    must see the same placement."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt_n)])).alias("_salt")
    small_rep = small.select(F.col("*"), salts)
    big_salted = big.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_n)))
    cond = (big_salted[big_key] == small_rep[small_key]) & (
        big_salted["_salt"] == small_rep["_salt"]
    )
    return big_salted.join(small_rep, cond, how).drop("_salt")


def skew_key_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """The pre-shuffle skew diagnosis a planner wants before committing a
    100 TB join/aggregation to a key: the top-N heaviest keys, each with
    its exact row count, its q6 share of the table, and the salt factor
    (ceil(count / target_rows_per_task)) that would spread it back to
    task-sized slices — i.e. the input salted_join/salted_aggregate need.

    One map-side-combined count shuffle (wordcount-shaped); the top-N
    selection is orderBy().limit() (per-partition top-k + merge, the
    vocab_top idiom — NEVER a window over the full key relation, which
    can hold billions of distinct keys at 100 TB), so the only window
    runs over the N selected rows. Shares are exact integer q6
    ((cnt*10^6) div total) and the salt factor is an integer ceiling
    div, so the report replays in the oracle; keys needing no salt
    report salt_factor = 1."""
    from pyspark.sql.window import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    totals = counts.agg(F.sum("cnt").cast("bigint").alias("_total"))
    top = counts.orderBy(F.desc("cnt"), F.asc(key_col)).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc(key_col))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(totals))
        .select(
            "rank",
            F.col(key_col),
            "cnt",
            F.expr("(cnt * 1000000) div _total").cast("bigint").alias("share_q6"),
            F.expr(f"(cnt + {target_rows_per_task - 1}) div {target_rows_per_task}")
            .cast("int")
            .alias("salt_factor"),
        )
    )
