"""Sort family (SURVEY.md §2.6): spec parser units + oracle-checked queries
+ the secondary-sort partition contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_1_spark.operators import keyfield, sort
from tests.conftest import SF_DIR, assert_query_matches_oracle


def test_parse_sort_spec():
    specs = keyfield.parse_sort_spec("-k2,2nr -k1.3,1")
    assert len(specs) == 2
    a, b = specs
    assert (a.field_start, a.field_end, a.numeric, a.reverse) == (2, 2, True, True)
    assert (b.field_start, b.field_end, b.char_start) == (1, 1, 3)
    assert not b.numeric and not b.reverse


def test_keyfield_sort_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "keyfield_sort")


def test_keyfield_sort_global_oracle(spark, duck):
    """Flag-only '-r' spec: the whole-line default-global KeyDescription
    path (KeyFieldHelper.java:183-192, pinned r10) driven end-to-end as
    a reverse total-order sort."""
    assert_query_matches_oracle(spark, duck, "keyfield_sort_global")


def test_top_k_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "top_k")


def test_secondary_sort_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "secondary_sort")


def test_terasort_validate_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "terasort_validate")


def test_sort_validate_detects_unsorted(spark):
    df = spark.range(1000).select((F.lit(999999) - F.col("id")).alias("key"))
    unsorted = df.repartition(4)
    row = sort.sort_validate(unsorted, F.col("key")).collect()[0]
    assert row["records"] == 1000
    assert not row["is_sorted"]
    row2 = sort.sort_validate(unsorted.orderBy("key"), F.col("key")).collect()[0]
    assert row2["is_sorted"]
    assert row2["checksum"] == row["checksum"]


def test_secondary_sort_partitions_contract(spark):
    """Each partition holds whole groups; rows within a partition are sorted
    by (key, secondary) — the reducer-iterator shape."""
    from hadoop_1_spark.session import load_table

    orders = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    parts = sort.secondary_sort_partitions(
        orders, "o_custkey", "o_orderdate", "o_orderkey", num_partitions=8
    )

    def check(pdf):
        import pandas as pd

        ok = bool(
            pdf.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
            .reset_index(drop=True)
            .equals(pdf.reset_index(drop=True))
        )
        return pd.DataFrame({"ok": [ok], "keys": [pdf["o_custkey"].nunique()]})

    per_part = (
        parts.mapInPandas(
            lambda it: (check(pdf) for pdf in [__import__("pandas").concat(list(it))]),
            schema="ok boolean, keys long",
        )
        .collect()
    )
    assert all(r["ok"] for r in per_part)
    total_keys = sum(r["keys"] for r in per_part)
    distinct_keys = orders.select("o_custkey").distinct().count()
    assert total_keys == distinct_keys  # groups not split across partitions


def test_global_rank_matches_single_window(spark):
    """Distributed rank (range shuffle + offsets) == the single-window
    row_number ranking, on a total order with ties broken."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_1_spark.operators.sort import global_rank

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, *order).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["rank"]
        for r in df.select(F.row_number().over(w).alias("rank"), "id").collect()
    }
    assert got == want


def test_global_prefix_sum_exact(spark):
    """Distributed scan == single-machine cumsum over the same total
    order, across many range partitions; NULLs count 0."""
    from hadoop_1_spark.operators import sort as sortops

    rows = [(i, ((i * 37) % 11) or None) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    out = sortops.global_prefix_sum(df, "k", value_col="v", out_col="cum")
    got = {r.k: r.cum for r in out.collect()}
    acc = 0
    for k, v in sorted(rows):
        acc += v or 0
        assert got[k] == acc
    assert len(got) == 500


def test_global_prefix_sum_rejects_non_integral(spark):
    import pytest

    from hadoop_1_spark.operators import sort as sortops

    df = spark.createDataFrame([(1, 0.5)], "k long, v double")
    with pytest.raises(ValueError):
        sortops.global_prefix_sum(df, "k", value_col="v")


def test_zorder_key_hand_computed(spark):
    """Morton interleave of (x=3, y=5) at 3 bits:
    x bits 1,1 at positions 0,2; y bits 1,0,1 at positions 1,3,5 ->
    1 + 2 + 4 + 0 + 32 = 39."""
    from hadoop_1_spark.operators import sort as S

    df = spark.createDataFrame([(3, 5)], "x long, y long")
    out = df.select(S.zorder_key("x", "y", bits=3).alias("z")).collect()
    assert out[0]["z"] == 39


def test_write_zordered_layout(spark, tmp_path):
    """Range-partitioned Morton write: per-file z-ranges are disjoint and
    each file's (x, y) envelope is a bounded rectangle — unlike a plain
    x-sort, whose files span the full y domain."""
    import pyspark.sql.functions as F

    from hadoop_1_spark.operators import sort as S

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), F.expr("id div 64").alias("y")
    )
    path = str(tmp_path / "zord")
    S.write_zordered(df, path, "x", "y", n_files=8, bits=6)
    back = spark.read.parquet(path).select(
        "x", "y",
        S.zorder_key("x", "y", bits=6).alias("z"),
        F.input_file_name().alias("f"),
    )
    stats = back.groupBy("f").agg(
        F.min("z").alias("zmin"), F.max("z").alias("zmax"),
        (F.max("x") - F.min("x")).alias("xspan"),
        (F.max("y") - F.min("y")).alias("yspan"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    assert sum(r["n"] for r in stats) == 4096
    ordered = sorted(stats, key=lambda r: r["zmin"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["zmax"] <= b["zmin"]  # disjoint z-ranges across files
    # bounded rectangles ON AVERAGE: an aligned 512-key z-range covers a
    # 32x16 cell block, but a file whose sampled range boundary crosses a
    # major quadrant split can legitimately span the full domain in one
    # dimension — so the locality claim is about the mean envelope, which
    # must sit well under the full 64-cell span a plain x-sort would give
    # every file in y.
    assert sum(r["xspan"] for r in stats) / len(stats) <= 48
    assert sum(r["yspan"] for r in stats) / len(stats) <= 48
