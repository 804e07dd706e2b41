"""Sources/sinks facade + generators (SURVEY.md §2.1/§2.2) and set-op
queries."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_1_spark.sources import generators, io
from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize(
    "name",
    ["union_multi_inputs", "distinct_keys", "set_except", "set_intersect", "pi_estimator"],
)
def test_setops_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_kv_text_roundtrip(spark, tmp_path):
    """K1 writer + S2 reader invert each other; separator configurable; line
    without separator -> (line, '')."""
    path = str(tmp_path / "kv")
    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v with spaces"), ("k3", "")], ["key", "value"]
    )
    io.write_kv_text(df, path, separator="\t")
    back = io.read_kv_text(spark, path, separator="\t")
    assert {tuple(r) for r in back.collect()} == {
        ("k1", "v1"), ("k2", "v with spaces"), ("k3", "")
    }


def test_kv_text_first_separator_only(spark, tmp_path):
    path = str(tmp_path / "kv2")
    spark.createDataFrame([("a:b:c",), ("nosep",)], ["value"]).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
    back = io.read_kv_text(spark, path, separator=":")
    assert {tuple(r) for r in back.collect()} == {("a", "b:c"), ("nosep", "")}


def test_write_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "parts")
    df = spark.createDataFrame([(1, "A"), (2, "B"), (3, "A")], ["id", "grp"])
    io.write_partitioned(df, path, "grp")
    assert sorted(d for d in os.listdir(path) if d.startswith("grp=")) == ["grp=A", "grp=B"]
    assert spark.read.parquet(path).count() == 3


def test_multiple_outputs_one_scan(spark, tmp_path):
    src = spark.range(100).select("id", (F.col("id") % 2).alias("par"))
    io.multiple_outputs(
        src,
        {
            "even": (lambda d: d.filter(F.col("par") == 0).select("id"), str(tmp_path / "even")),
            "odd": (lambda d: d.filter(F.col("par") == 1).select("id"), str(tmp_path / "odd")),
        },
    )
    assert spark.read.parquet(str(tmp_path / "even")).count() == 50
    assert spark.read.parquet(str(tmp_path / "odd")).count() == 50


def test_read_auto_sniffs(spark, tmp_path):
    pq = str(tmp_path / "auto.parquet")
    spark.range(10).write.parquet(pq)
    assert io.read_auto(spark, pq).count() == 10
    txt = str(tmp_path / "auto_txt")
    spark.createDataFrame([("hello",)], ["value"]).write.text(txt)
    assert io.read_auto(spark, txt).columns == ["line"]


def test_n_line_splits(spark):
    df = spark.range(100).repartition(3)
    assert io.n_line_splits(df, 10).rdd.getNumPartitions() == 10


def test_teragen_shape(spark):
    rows = generators.teragen(spark, 50).collect()
    assert len(rows) == 50
    assert all(len(r["key"]) == 10 and len(r["value"]) == 88 for r in rows)
    assert len({r["key"] for r in rows}) == 50  # keys well-mixed


def test_random_writer_deterministic(spark):
    a = generators.random_writer(spark, 20, seed=7).collect()
    b = generators.random_writer(spark, 20, seed=7).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(10 <= len(r["key"]) <= 1000 and len(r["value"]) <= 10000 for r in a)


def test_random_text_writer_shape(spark):
    rows = generators.random_text_writer(spark, 20, seed=7).collect()
    assert len(rows) == 20
    for r in rows:
        assert 5 <= len(r["key"].split(" ")) <= 10
        assert 20 <= len(r["value"].split(" ")) <= 100
        assert all(w.startswith("word") for w in r["key"].split(" "))


def test_empty_relation(spark):
    df = generators.empty(spark)
    assert df.count() == 0 and df.columns == ["key", "value"]


def test_mapfile_style_point_lookup(spark, tmp_path):
    """K3 MapFileOutputFormat parity: sorted-by-key parquet + point lookup.
    The lookup predicate must reach the scan (PushedFilters) so row-group
    min/max stats prune — the MapFile sparse-index analog."""
    path = str(tmp_path / "mapfile")
    df = spark.range(0, 10000).select(
        F.col("id").alias("key"), F.md5(F.col("id").cast("string")).alias("value")
    )
    df.repartition(4, "key").sortWithinPartitions("key").write.parquet(path)

    back = spark.read.parquet(path)
    lookup = back.where(F.col("key") == 1234)
    plan = lookup._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(key), EqualTo(key,1234)]" in plan
    rows = lookup.collect()
    assert len(rows) == 1 and rows[0]["value"].startswith(rows[0]["value"][:4])


def test_bloom_filter_parquet_write(spark, tmp_path):
    """BloomMapFile parity (io/BloomMapFile.java:45,73): parquet bloom
    filters on the key column guard point lookups before touching data
    pages. pyarrow here doesn't expose bloom metadata, so assert the
    bloom-enabled file carries the extra filter bytes vs a plain write."""
    plain = str(tmp_path / "plain")
    bloom = str(tmp_path / "bloom")
    df = spark.range(0, 5000).select(F.md5(F.col("id").cast("string")).alias("key"))
    df.coalesce(1).write.parquet(plain)
    (
        df.coalesce(1)
        .write.option("parquet.bloom.filter.enabled#key", "true")
        .option("parquet.bloom.filter.expected.ndv#key", "5000")
        .parquet(bloom)
    )

    def nbytes(d):
        return sum(
            os.path.getsize(os.path.join(d, x))
            for x in os.listdir(d)
            if x.endswith(".parquet")
        )

    assert nbytes(bloom) > nbytes(plain) + 2000  # filter bitset present
    back = spark.read.parquet(bloom).where(F.col("key") == "x")
    assert back.count() == 0


@pytest.mark.parametrize("codec", ["snappy", "gzip", "zstd"])
def test_compression_codecs_roundtrip(spark, tmp_path, codec):
    """Codec parity (§1.3: DefaultCodec/GzipCodec/BZip2Codec/SnappyCodec):
    per-file compression is a write option; reads are codec-transparent."""
    path = str(tmp_path / codec)
    df = spark.range(0, 1000).select(F.col("id"), F.md5(F.col("id").cast("string")).alias("v"))
    df.write.option("compression", codec).parquet(path)
    assert spark.read.parquet(path).count() == 1000


def test_text_gzip_roundtrip(spark, tmp_path):
    path = str(tmp_path / "txtgz")
    spark.createDataFrame([("hello",), ("world",)], "value string").coalesce(1).write.option(
        "compression", "gzip"
    ).text(path)
    assert any(f.endswith(".gz") for f in os.listdir(path))
    got = sorted(r["value"] for r in spark.read.text(path).collect())
    assert got == ["hello", "world"]


def test_sequence_file_roundtrip(spark, tmp_path):
    """S4/K2: byte-level SequenceFile write -> read round trip (the compat
    path next to parquet-native)."""
    path = str(tmp_path / "seq")
    df = spark.createDataFrame([("k1", "v1"), ("k2", "v2")], "key string, value string")
    io.write_sequence_file(df, path)
    back = io.read_sequence_file(spark, path)
    assert sorted(map(tuple, back.collect())) == [("k1", "v1"), ("k2", "v2")]


def test_construct_insert_query_reference_parity():
    """The two reference cases from TestConstructQuery.java verbatim."""
    assert (
        io.construct_insert_query("hadoop_output", ["id", "name", "value"])
        == "INSERT INTO hadoop_output (id,name,value) VALUES (?,?,?);"
    )
    assert (
        io.construct_insert_query("hadoop_output", [None, None, None])
        == "INSERT INTO hadoop_output VALUES (?,?,?);"
    )
    with pytest.raises(ValueError):
        io.construct_insert_query("t", None)


def test_write_jdbc_plumbing_reaches_driver_lookup(spark):
    """No JDBC driver ships in this container; assert the facade builds a
    real JDBC write (failure mode = driver lookup, not facade errors)."""
    df = spark.range(4).selectExpr("id", "CAST(id AS STRING) AS name")
    with pytest.raises(Exception) as ei:
        io.write_jdbc(df, "jdbc:nosuchdb://x/y", "t", num_partitions=1)
    msg = str(ei.value)
    assert "driver" in msg.lower() or "jdbc" in msg.lower()


def test_compact_small_files_har_parity(spark, tmp_path):
    """HAR compaction: 20 tiny files -> 1 part + manifest; per-file
    content round-trips through the pushed-down point lookup."""
    import os

    from hadoop_1_spark.sources import io as hio

    src = tmp_path / "logs"
    os.makedirs(src)
    for i in range(20):
        (src / f"log{i:02d}.txt").write_text(f"alpha {i}\nbeta {i}\n")
    dst = str(tmp_path / "archive")
    manifest = hio.compact_small_files(spark, f"{src}/*.txt", dst)
    rows = {r["src_path"].rsplit("/", 1)[-1]: r["n_lines"] for r in manifest.collect()}
    assert len(rows) == 20 and all(n == 2 for n in rows.values())
    # few large parts instead of 20 small files
    parts = [f for f in os.listdir(os.path.join(dst, "data")) if f.endswith(".parquet")]
    assert len(parts) == 1
    # point lookup returns exactly the one file's lines, filter pushed down
    target = next(
        r["src_path"] for r in manifest.collect() if r["src_path"].endswith("log07.txt")
    )
    got = hio.read_archived_file(spark, dst, target)
    assert sorted(r["line"] for r in got.collect()) == ["alpha 7", "beta 7"]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(src_path), EqualTo(src_path" in plan


def test_write_bloom_map_lookup_and_bytes(spark, tmp_path):
    """BloomMapFile parity: bloom-filtered sorted write serves exact point
    lookups; the bloom filter physically lands in the file (same data
    without the option is smaller)."""
    import os

    from pyspark.sql import functions as F

    from hadoop_1_spark.sources import io as hio

    df = spark.range(50000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.col("id") * 3).alias("value"),
    )
    with_bloom = str(tmp_path / "bloom")
    without = str(tmp_path / "plain")
    hio.write_bloom_map(df, with_bloom, "key", expected_ndv=50000)
    df.repartition("key").sortWithinPartitions("key").write.mode("overwrite").parquet(without)

    def psize(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert psize(with_bloom) > psize(without)  # bloom bytes are in the file
    got = (
        spark.read.parquet(with_bloom).where(F.col("key") == "k31415").collect()
    )
    assert [(r["key"], r["value"]) for r in got] == [("k31415", 94245)]


def test_stats_prune_roundtrip(spark, tmp_path):
    """write_range_sorted -> file_stats -> pruned_read: fewer files
    opened, identical rows to the full-scan filter."""
    from hadoop_1_spark.sources import skipping

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("v")
    )
    path = str(tmp_path / "sorted")
    skipping.write_range_sorted(df, path, "k", n_files=8)

    stats = skipping.file_stats(spark, path, "k")
    srows = stats.collect()
    assert len(srows) == 8
    assert sum(r["n_rows"] for r in srows) == 10_000
    # range-sorted layout => disjoint envelopes
    spans = sorted((r["min_v"], r["max_v"]) for r in srows)
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b < c

    got, n_files = skipping.pruned_read(spark, stats, "k", 2_000, 3_500)
    assert n_files < 8  # pruning actually skipped files
    expect = sorted(
        (r["k"], r["v"])
        for r in spark.read.parquet(path).where(F.col("k").between(2000, 3500)).collect()
    )
    assert sorted((r["k"], r["v"]) for r in got.collect()) == expect


def test_stats_prune_empty_window(spark, tmp_path):
    from hadoop_1_spark.sources import skipping

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    path = str(tmp_path / "sorted2")
    skipping.write_range_sorted(df, path, "k", n_files=4)
    stats = skipping.file_stats(spark, path, "k")
    got, n_files = skipping.pruned_read(spark, stats, "k", 1_000, 2_000)
    assert n_files == 0
    assert got.count() == 0
    assert got.schema == spark.read.parquet(path).schema


def test_layout_stats_prune_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "layout_stats_prune")


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    """ORC write -> read round-trip preserves rows and schema, a
    partitioned write prunes directories, and an equality filter is
    pushed into the ORC scan (PushedFilters in the physical plan)."""
    from hadoop_1_spark.sources import io as hio

    df = spark.range(100).selectExpr(
        "id", "CAST(id % 3 AS INT) AS grp", "CAST(id * 2 AS DOUBLE) AS v"
    )
    path = str(tmp_path / "orc_plain")
    hio.write_orc(df, path)
    back = hio.read_orc(spark, path)
    # nullability relaxes on read-back (ORC files don't carry Spark's
    # non-null flag for range()); names and types are the contract
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert sorted(r["id"] for r in back.collect()) == list(range(100))

    filtered = back.where(F.col("id") == 7).select("id", "v")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan

    ppath = str(tmp_path / "orc_part")
    hio.write_orc(df, ppath, partition_by=["grp"])
    import os

    assert sorted(
        d for d in os.listdir(ppath) if d.startswith("grp=")
    ) == ["grp=0", "grp=1", "grp=2"]
    pruned = hio.read_orc(spark, ppath).where("grp = 1")
    assert pruned.count() == 33


def test_jsonl_round_trip(spark, tmp_path):
    """JSONL write -> schema'd read round-trip preserves values; the
    explicit-schema read skips inference (column order pinned)."""
    from hadoop_1_spark.sources import io as hio

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double"
    )
    path = str(tmp_path / "jl")
    hio.write_jsonl(df, path)
    back = hio.read_jsonl(spark, path, "id long, s string, v double")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_round_trip_and_bad_record_modes(spark, tmp_path):
    """CSV write -> schema'd read round-trip; a malformed row is dropped
    under DROPMALFORMED (SkipBadRecords idiom) and surfaced as NULLs +
    _corrupt_record under PERMISSIVE."""
    from hadoop_1_spark.sources import io as hio

    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double")
    path = str(tmp_path / "csv")
    hio.write_csv(df, path)
    back = hio.read_csv(spark, path, "id long, s string, v double")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    badpath = str(tmp_path / "bad")
    os.makedirs(badpath)
    with open(os.path.join(badpath, "part.csv"), "w") as f:
        f.write("id,s,v\n1,a,1.5\n2,b,not_a_number\n3,c,3.5\n")
    dropped = hio.read_csv(spark, badpath, "id long, s string, v double",
                           mode="DROPMALFORMED")
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]
    permissive = hio.read_csv(
        spark, badpath,
        "id long, s string, v double, _corrupt_record string",
    )
    rows = {r["id"]: r for r in permissive.collect()}
    assert rows[2]["v"] is None and rows[2]["_corrupt_record"] is not None
    assert rows[1]["_corrupt_record"] is None


def test_jsonl_corrupt_record_surfacing(spark, tmp_path):
    """A non-JSON line lands in _corrupt_record (PERMISSIVE default)
    instead of failing the scan — the SkipBadRecords contract for
    self-describing text."""
    from hadoop_1_spark.sources import io as hio

    p = str(tmp_path / "jl")
    os.makedirs(p)
    with open(os.path.join(p, "part.json"), "w") as f:
        f.write('{"id": 1, "s": "a"}\nTHIS IS NOT JSON\n{"id": 2, "s": "b"}\n')
    back = hio.read_jsonl(spark, p, "id long, s string, _corrupt_record string")
    rows = sorted(back.collect(), key=lambda r: (r["id"] is None, r["id"] or 0))
    assert [r["id"] for r in rows] == [1, 2, None]
    assert rows[2]["_corrupt_record"] == "THIS IS NOT JSON"
