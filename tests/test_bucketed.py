"""J1 no-shuffle parity: CompositeInputFormat's shuffle-free merge join
over equal-partitioned, key-sorted inputs == Spark bucketed tables joined
without an Exchange (SURVEY.md §2.4 J1, §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark):
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    orders = spark.range(0, 1000).select(
        F.col("id").alias("okey"), (F.col("id") % 7).alias("status")
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("okey"), F.col("id").alias("item")
    )
    (orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("bt_orders"))
    (items.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("bt_lineitem"))

    a = spark.table("bt_orders")
    b = spark.table("bt_lineitem")
    joined = a.hint("merge").join(b, "okey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # bucketing makes both sides co-partitioned on okey: no shuffle at all
    assert "Exchange" not in plan
    assert joined.count() == 5000

    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
