"""Record linkage / entity resolution: blocked fuzzy matching between
records of a dimension table (the master-data dedup problem — same
real-world entity, different rows).

Reference anchor: the data_join contrib's tagged reduce-side join
(contrib/data_join/.../DataJoinReducerBase.java — group candidate rows
by a chosen key, then pairwise-combine inside the group). Blocking is
exactly that idea: the block key bounds which rows can ever meet, and
the in-block comparator here is exact token Jaccard instead of a
user-supplied combine().

Scale notes (100 TB design intent):
- candidate generation is a self-join on (block, token) — only pairs
  that share a token inside a block are ever materialized; the shuffle
  key is narrow and the blocking key bounds the worst block to a
  reducer-sized slice. Block choice is the scale lever: brands/regions/
  zip prefixes at master-data scale keep blocks in the thousands.
- ``hot_token_cap`` drops tokens whose in-block document frequency
  exceeds the cap before the join — the same skew guard as
  dedup.ngram_jaccard_pairs' df_cap (a stopword-like token inside a
  100k-row block would emit 10^10 pairs).
- the similarity is integer-exact q6 Jaccard ((inter*10^6) div union):
  both engines rank identical bigints, no float thresholds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_1_spark.operators import textops


def blocked_jaccard_match(
    records: DataFrame,
    id_col: str,
    text: Column,
    block_cols: tuple[str, ...],
    min_jaccard_q6: int = 660000,
    hot_token_cap: int | None = None,
) -> DataFrame:
    """Entity-match candidate pairs within blocks: distinct lowercased
    whitespace tokens of ``text`` per record, self-join on
    (*block_cols, token), exact q6 token-set Jaccard per pair, keep
    pairs >= ``min_jaccard_q6``. Returns (id1, id2, jaccard_q6).

    A pair straddling two blocks is NEVER compared — that recall loss is
    the blocking bargain; run multiple passes with different block keys
    for higher recall (the standard multi-pass blocking scheme)."""
    tok = records.select(
        *block_cols,
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(textops.ws_tokens(F.lower(text)))).alias(
            "token"
        ),
    )
    if hot_token_cap is not None:
        freq = tok.groupBy(*block_cols, "token").agg(
            F.count(F.lit(1)).alias("_tf")
        )
        tok = tok.join(
            F.broadcast(freq.where(F.col("_tf") > hot_token_cap)),
            [*block_cols, "token"],
            "left_anti",
        )
    from hadoop_1_spark.operators.caching import persist_tracked

    tok = persist_tracked(tok)
    sizes = tok.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = tok.select(*block_cols, F.col("_id").alias("id1"), "token")
    b = tok.select(*block_cols, F.col("_id").alias("id2"), "token")
    inter = (
        a.join(b, [*block_cols, "token"])
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # sizes is O(records) — no broadcast hint; AQE picks BHJ while the
    # dimension fits and falls back to shuffle join at master-data scale.
    return (
        inter.join(
            sizes.select(F.col("_id").alias("id1"), F.col("_n").alias("_n1")),
            "id1",
        )
        .join(
            sizes.select(F.col("_id").alias("id2"), F.col("_n").alias("_n2")),
            "id2",
        )
        .select(
            "id1",
            "id2",
            F.expr("(_c * 1000000) div (_n1 + _n2 - _c)")
            .cast("bigint")
            .alias("jaccard_q6"),
        )
        .where(F.col("jaccard_q6") >= min_jaccard_q6)
    )


def blocked_levenshtein_pairs(
    records: DataFrame,
    id_col: str,
    text: Column,
    block: Column,
    max_dist: int,
    prefix_len: int = 40,
) -> DataFrame:
    """Edit-distance record matching within blocks: compare the first
    ``prefix_len`` chars of ``text`` for every in-block id-ordered pair
    and keep pairs with Levenshtein distance <= ``max_dist``. Returns
    (id_a, id_b, dist) with id_a < id_b.

    The character-level sibling of blocked_jaccard_match: token Jaccard
    is blind to in-word typos, edit distance catches them. The prefix
    truncation is the cost bound — Levenshtein is O(len^2) per pair, so
    the comparator runs on a fixed-width key (title/prefix), never the
    whole record; a length-difference pre-filter (|len_a - len_b| >
    max_dist is a Levenshtein lower bound) prunes before the quadratic
    work. Both engines implement textbook Levenshtein, so the distance
    is exact and the output hash-checkable.

    Scale: one self-join shuffle on the block key; the block bounds the
    quadratic pair set (the blocked_jaccard_match lever), and the fixed
    prefix bounds per-pair cost. A hot block of B rows still emits
    B^2/2 pairs — refine the block key before raising max_dist."""
    base = records.where(text.isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.substring(text, 1, prefix_len).alias("_t"),
        block.alias("_blk"),
    )
    # Catalyst pushes the distance predicate into the join condition, so
    # ALL of the quadratic comparator work executes inside the join stage
    # — whose task count is the probe side's partitioning (one task for a
    # single-file scan). Splitting the probe side to full parallelism
    # before the join is what spreads the O(prefix_len^2)-per-pair cost;
    # a post-join repartition would be too late, and AQE's byte-based
    # coalescing cannot see row COST, only row bytes (measured at sf0.1:
    # 11.7 s single-task vs ~1.5 s spread).
    n_spread = records.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(n_spread).select(
        F.col("_id").alias("id_a"), F.col("_t").alias("_ta"), "_blk"
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_t").alias("_tb"), "_blk"
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.abs(F.length("_ta") - F.length("_tb")) <= F.lit(max_dist)
        )
        .select(
            "id_a", "id_b",
            F.levenshtein("_ta", "_tb").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
