"""Generate an sf1-scale probe dataset (~10x sf0.1) for the scaling-curve
measurement in BENCH_NOTES — NOT driver testdata (never written under
/root/testdata; defaults to /tmp/sf1).

Statistically mimics the sf0.1 tables the probe queries touch:
- documents: 50,000 docs, 10-100 whitespace tokens drawn from the same
  31-word vocabulary (xxhash64-seeded, fully deterministic), lang mix
  ~(en 41%, zh/es/fr/de ~15%), 20 sources, and ~1/600 docs an exact
  duplicate of its predecessor (sf0.1 has 8 dup groups / 5000 docs).
- lineitem: the sf0.1 table unioned 10x with disjoint l_orderkey ranges.

Generation is all JVM-side expressions (sequence + transform + xxhash64)
— no driver loop, no Python in the row path, so the generator itself
scales like the engine does.

Usage: python scripts/gen_scale_probe.py [out_dir] [n_docs] [mult]

``mult`` (default 10) is the replication factor vs sf0.1 — pass 100 for
the sf10 (100x) probe: python scripts/gen_scale_probe.py /tmp/sf10
500000 100.  Replication is one broadcast crossJoin against a mult-row
range with per-copy key shifts (not a mult-way union: a 100-branch union
plan is O(mult) to analyze; the crossJoin is O(1) and pipelines).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_1_spark.session import get_spark  # noqa: E402


def replicate(df, mult: int, **shifts: int):
    """mult disjoint copies of df: copy i shifts each named key column by
    i * stride (strides chosen so ranges never collide)."""
    reps = df.sparkSession.range(mult).select(F.col("id").alias("_rep"))
    out = df.crossJoin(F.broadcast(reps))
    for col, stride in shifts.items():
        out = out.withColumn(col, F.col(col) + F.col("_rep") * F.lit(stride))
    return out.drop("_rep")

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "en", "en", "zh", "es", "fr", "de"]  # ~41% en, rest even


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("gen_scale_probe")

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    langs = F.array(*[F.lit(lang) for lang in LANGS])
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # every 600th doc re-generates from its predecessor's id -> exact dup
    src_id = F.when(
        (F.col("doc_id") % 600 == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    n_tok = (F.pmod(F.xxhash64(src_id, F.lit("len")), F.lit(91)) + 10).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(src_id, i), F.lit(len(VOCAB))) + 1).cast("int")
            ),
        ),
        " ",
    )
    docs = base.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            langs, (F.pmod(F.xxhash64(F.col("doc_id"), F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int")
        ).alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64(F.col("doc_id"), F.lit("src")), F.lit(20))
        ).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.repartition(32).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    replicate(li, mult, l_orderkey=100_000_000).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )

    # orders: replicated with the SAME disjoint o_orderkey shift as
    # lineitem so the bloom/semi-join probes keep their match rate;
    # supplier copied as-is (lineitem keeps original l_suppkey values)
    od = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    replicate(od, mult, o_orderkey=100_000_000).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    spark.read.parquet("/root/testdata/sf0.1/supplier.parquet").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "supplier.parquet"))

    # part: mult x by disjoint p_partkey, SAME 25 brands — blocks grow
    # mult x, so the blocked-linkage probe honestly measures the quadratic
    # in-block candidate growth (the finer-block-key lever at scale)
    pt = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
    replicate(pt, mult, p_partkey=10_000_000).write.mode("overwrite").parquet(
        os.path.join(out, "part.parquet")
    )

    # customer: replicated with the SAME c_custkey shift as events'
    # user_id so user-keyed joins/samples keep their match rate
    cu = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    replicate(cu, mult, c_custkey=10_000_000).write.mode("overwrite").parquet(
        os.path.join(out, "customer.parquet")
    )

    # events: mult x by disjoint user/event id ranges (mult x the users,
    # same per-user history density — sessionization cost scales with keys)
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    replicate(
        ev, mult, user_id=10_000_000, event_id=1_000_000_000
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    # embeddings: mult x by disjoint vec_id ranges (identical vectors
    # repeat — fine for timing: distance arithmetic is value-independent)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    replicate(emb, mult, vec_id=10_000_000).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    # static dims copied as-is: region/nation don't scale with SF, and the
    # snowflake joins (tpch_q5) need them present in the probe dir
    for dim in ("region", "nation"):
        spark.read.parquet(f"/root/testdata/sf0.1/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{dim}.parquet"))

    # negative-sampling thin-path probe fixtures (round-6 verdict #2): the
    # driver testdata catalog is 100 items — below the 2*target=128
    # full-grid cutoff — so the hash-thinned BroadcastNestedLoopJoin path
    # (the 100 TB shape: catalog broadcast, interactions the big side)
    # never runs there. Three deterministic legs, all >16k items: base
    # (1.5k users x 24k items), catalog x10, users x10. Timed by
    # scripts/neg_probe.py.
    for tag, n_users, n_items in (
        ("base", 1_500, 24_000),
        ("cat10", 1_500, 240_000),
        ("usr10", 15_000, 24_000),
    ):
        users = spark.range(n_users).select((F.col("id") + 1).alias("user_id"))
        pos = users.select(
            "user_id", F.explode(F.sequence(F.lit(1), F.lit(20))).alias("j")
        ).select(
            "user_id",
            F.pmod(F.xxhash64("user_id", "j"), F.lit(n_items)).alias("item"),
        )
        cat = spark.range(n_items).select(F.col("id").alias("item"))
        pos.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"negprobe_{tag}_pos.parquet")
        )
        cat.write.mode("overwrite").parquet(
            os.path.join(out, f"negprobe_{tag}_cat.parquet")
        )
    print(
        f"wrote {out}: documents={n_docs}, "
        f"lineitem/events/embeddings={mult}x sf0.1"
    )


if __name__ == "__main__":
    main()
