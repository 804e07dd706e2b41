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


def _warehouse(spark):
    return spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")


def test_park_bucketed_ownership_contract(spark, tmp_path):
    """The park_marker ownership contract (r9/r10): ONLY marker-bearing
    locations are ever cleared or overwritten; the marker is claimed
    BEFORE saveAsTable so a crash mid-write leaves a reclaimable
    location, and a fingerprint match reuses the parked layout without
    rewriting."""
    import os
    import pytest
    from hadoop_1_spark.operators.bucketed import park_bucketed

    df = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    wh = _warehouse(spark)

    # 1. a foreign catalog table without a marker is never overwritten
    spark.sql("DROP TABLE IF EXISTS pk_foreign")
    spark.range(5).write.saveAsTable("pk_foreign")
    marker = os.path.join(wh, "pk_foreign.park_marker")
    assert not os.path.exists(marker)
    with pytest.raises(ValueError, match="did not park"):
        park_bucketed(spark, df, "pk_foreign", "k")
    assert spark.table("pk_foreign").count() == 5  # untouched
    assert not os.path.exists(marker)  # and no ownership claimed
    spark.sql("DROP TABLE IF EXISTS pk_foreign")

    # 2. a foreign orphaned DIRECTORY without a marker is never deleted
    loc = os.path.join(wh, "pk_orphan")
    os.makedirs(loc, exist_ok=True)
    sentinel = os.path.join(loc, "not_ours.txt")
    with open(sentinel, "w") as fh:
        fh.write("precious")
    with pytest.raises(ValueError, match="refusing to delete"):
        park_bucketed(spark, df, "pk_orphan", "k")
    assert os.path.exists(sentinel)
    os.remove(sentinel)
    os.rmdir(loc)

    # 3. normal park: marker holds the fingerprint after success, and a
    # matching fingerprint skips the rewrite (parquet files untouched)
    spark.sql("DROP TABLE IF EXISTS pk_mine")
    for p in (os.path.join(wh, "pk_mine.park_marker"),
              os.path.join(wh, "pk_mine.fingerprint")):
        if os.path.exists(p):
            os.remove(p)
    got = park_bucketed(spark, df, "pk_mine", "k", fingerprint="fp1")
    assert got.count() == 100
    m = os.path.join(wh, "pk_mine.park_marker")
    assert open(m).read() == "fp1"
    files = sorted(os.listdir(os.path.join(wh, "pk_mine")))
    mtimes = [os.path.getmtime(os.path.join(wh, "pk_mine", f)) for f in files]
    again = park_bucketed(spark, df.limit(1), "pk_mine", "k", fingerprint="fp1")
    assert again.count() == 100  # reused, NOT rewritten from df.limit(1)
    assert sorted(os.listdir(os.path.join(wh, "pk_mine"))) == files
    assert [os.path.getmtime(os.path.join(wh, "pk_mine", f)) for f in files] == mtimes

    # 4. crash simulation: an in-progress marker (claimed pre-save) makes
    # the orphaned location reclaimable instead of a permanent wedge
    spark.sql("DROP TABLE IF EXISTS pk_mine")
    with open(m, "w") as fh:
        fh.write("__park_in_progress__")
    reparked = park_bucketed(spark, df, "pk_mine", "k", fingerprint="fp2")
    assert reparked.count() == 100
    assert open(m).read() == "fp2"
    spark.sql("DROP TABLE IF EXISTS pk_mine")
    os.remove(m)
