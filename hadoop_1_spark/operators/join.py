"""Join family (SURVEY.md §2.4).

Reference parity:
- Map-side merge join expression language ``inner(a,b,...)``/``outer(...)``/
  ``override(...)`` over key-aligned sources: CompositeInputFormat grammar
  (mapred/join/CompositeInputFormat.java:57-71), parser
  (mapred/join/Parser.java:64), merge driver (CompositeRecordReader.java:38).
  Here the expression is a tiny builder AST (``tbl``/``inner``/``outer``/
  ``override``) that *compiles to a DataFrame plan* — Catalyst picks
  sort-merge or broadcast physically. The reference's no-shuffle property
  (pre-partitioned, key-sorted inputs) is recovered at scale by writing the
  sources as bucketed tables (bucketBy(key).sortBy(key)) so the SMJ needs no
  exchange.
- inner: keys present in ALL sources, cross-product of per-key value lists
  (InnerJoinRecordReader.java:41) = chained inner equi-joins.
- outer: keys in ANY source, absent slots null in the TupleWritable
  (OuterJoinRecordReader.java:41) = chained full-outer USING joins (nullable
  columns stand in for the presence bitmask, TupleWritable.java:43).
- override: per key, values only from the RIGHTMOST source containing it;
  no cross-product (OverrideRecordReader.java:36,49,62) = tagged union +
  per-key max-priority filter (one shuffle, no join blow-up).
- Reduce-side tagged join with arbitrary residual predicate within the key
  group (contrib/data_join DataJoinReducerBase.java:174-214 joinAndCollect
  cartesian + user combine()) = equi-join on the key + ``where(residual)``.
- Map-side hash join against a DistributedCache'd small table
  (filecache/DistributedCache.java:77-83) = ``F.broadcast`` hash join.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KEY = "key"


@dataclass(frozen=True)
class JoinExpr:
    """A node of the composite-join expression tree."""

    kind: str  # "tbl" | "inner" | "outer" | "override"
    children: tuple["JoinExpr", ...] = ()
    df: DataFrame | None = None
    value_cols: tuple[str, ...] = ()

    def compile(self) -> DataFrame:
        return _compile(self)

    @property
    def leaf_cols(self) -> tuple[str, ...]:
        if self.kind == "tbl":
            return self.value_cols
        return tuple(c for ch in self.children for c in ch.leaf_cols)


def tbl(df: DataFrame, key: Column | str, *value_cols: Column | str) -> JoinExpr:
    """Leaf source: ``tbl(Format, path)`` in the reference grammar. ``key``
    is aliased to the shared join-key column; value columns must be uniquely
    named across the whole expression."""
    key_col = F.col(key) if isinstance(key, str) else key
    vals = [F.col(c) if isinstance(c, str) else c for c in value_cols]
    out = df.select(key_col.alias(KEY), *vals)
    return JoinExpr("tbl", df=out, value_cols=tuple(out.columns[1:]))


def inner(*children: JoinExpr) -> JoinExpr:
    return JoinExpr("inner", children=children)


def outer(*children: JoinExpr) -> JoinExpr:
    return JoinExpr("outer", children=children)


def override(*children: JoinExpr) -> JoinExpr:
    return JoinExpr("override", children=children)


def _compile(node: JoinExpr) -> DataFrame:
    if node.kind == "tbl":
        return node.df
    cols = node.leaf_cols
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate value columns across sources: {cols}")
    kids = [_compile(ch) for ch in node.children]
    if node.kind in ("inner", "outer"):
        # Single-shuffle n-way merge: tagged union -> one groupBy(key)
        # gathering each source's rows as a list of structs -> explode the
        # lists back out (cross-product within the key, exactly the
        # TupleWritable iteration of InnerJoinRecordReader.java:41 /
        # OuterJoinRecordReader.java:41). A chained full-outer compilation
        # costs n-1 exchanges; this is ONE exchange regardless of n, and
        # the map-side partial collect_list keeps the shuffle rows tagged
        # (key, struct) — no wider than the inputs. Per-key state is the
        # key's row lists, the same working set the reference's
        # ResetableIterator holds; a pathological hot key is a skew problem
        # for both engines alike.
        parts = []
        for i, kid in enumerate(kids):
            vals = [c for c in kid.columns if c != KEY]
            parts.append(
                kid.select(F.col(KEY), F.struct(*vals).alias(f"_v{i}"))
            )
        unioned = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )
        # NULL keys never merge (SQL equi-join semantics; the groupBy
        # below would otherwise gather every NULL-keyed row from every
        # source into ONE group and cross-product them): inner drops
        # them, outer emits each as its own null-padded row (exactly a
        # chained FULL OUTER ... USING's treatment of NULL keys).
        null_keyed = unioned.where(F.col(KEY).isNull())
        unioned = unioned.where(F.col(KEY).isNotNull())
        # collect_list skips the NULL slots contributed by other sources'
        # union rows, so _l{i} is exactly source i's rows for the key.
        grouped = unioned.groupBy(KEY).agg(
            *[F.collect_list(f"_v{i}").alias(f"_l{i}") for i in range(len(kids))]
        )
        out = grouped
        for i in range(len(kids)):
            if node.kind == "inner":
                # explode of an empty list emits nothing -> keys missing
                # from any source vanish: inner semantics with no filter.
                out = out.withColumn(f"_e{i}", F.explode(f"_l{i}"))
            else:
                # explode_outer emits one NULL row for an empty list ->
                # absent slots null-pad: the TupleWritable presence mask.
                out = out.withColumn(f"_e{i}", F.explode_outer(f"_l{i}"))
        sel = [F.col(KEY)]
        for i, ch in enumerate(node.children):
            sel.extend(F.col(f"_e{i}.{c}").alias(c) for c in ch.leaf_cols)
        out = out.select(*sel)
        if node.kind == "outer":
            # One null-padded output row per NULL-keyed input row: the
            # union row already has exactly one non-null _v{i} struct, so
            # projecting every source's fields null-pads the rest.
            nsel = [F.col(KEY)]
            for i, ch in enumerate(node.children):
                nsel.extend(F.col(f"_v{i}.{c}").alias(c) for c in ch.leaf_cols)
            out = out.unionByName(null_keyed.select(*nsel))
        return out
    if node.kind == "override":
        # Tagged union + keep only rows of the highest-priority source per
        # key. Exactly the winner's rows survive — no cross-product, unlike
        # a join-based rewrite with duplicate keys.
        tagged = []
        for i, (kid, ch) in enumerate(zip(kids, node.children)):
            tagged.append(kid.withColumn("_src", F.lit(i)))
        unioned = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged
        )
        # NULL keys never merge here either: the window gathers every
        # NULL-keyed row into one partition, so the priority filter only
        # applies to real keys; NULL-keyed rows pass through from every
        # source (no override relationship without key equality).
        w = Window.partitionBy(KEY)
        return (
            unioned.withColumn("_max_src", F.max("_src").over(w))
            .filter(F.col(KEY).isNull() | (F.col("_src") == F.col("_max_src")))
            .select(KEY, *cols)
        )
    raise ValueError(f"unknown join expr kind {node.kind!r}")


def tagged_join(
    left: DataFrame,
    right: DataFrame,
    key,
    residual: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Reduce-side tagged join: group both tagged inputs by the join key,
    cartesian within the key group, keep pairs passing the residual predicate
    (DataJoinReducerBase.joinAndCollect:174-214 + combine()). Spark's shuffled
    equi-join IS that regrouping; the residual is a post-join filter that
    Catalyst evaluates inside the join when possible."""
    joined = left.join(right, on=key, how=how)
    return joined.where(residual) if residual is not None else joined


def broadcast_hash_join(big: DataFrame, small: DataFrame, key, how: str = "inner") -> DataFrame:
    """DistributedCache map-side hash join: ship the small table to every
    task, stream the big side with no shuffle (DistributedCache.java:77-83)."""
    return big.join(F.broadcast(small), on=key, how=how)
