"""Read/write facade: the reference's InputFormat/OutputFormat families
re-expressed as DataFrame readers/writers (SURVEY.md §2.1, §2.2).

Reference parity map:
- S1  TextInputFormat (mapred/TextInputFormat.java:32)        -> read_text
- S2  KeyValueTextInputFormat (mapred/KeyValueTextInputFormat.java:36,
      separator KeyValueLineRecordReader.java:59)             -> read_kv_text
- S3  NLineInputFormat (mapred/lib/NLineInputFormat.java:59)  -> n_line_splits
- S8  CombineFileInputFormat small-file packing               -> built-in
      (spark.sql.files.maxPartitionBytes); combine_small_files re-exposes it
- S9  MultipleInputs + DelegatingMapper
      (mapred/lib/MultipleInputs.java:34)                     -> multiple_inputs
- S10/S11 DBInputFormat / DataDrivenDBInputFormat
      (mapreduce/lib/db/DBInputFormat.java:57,
       DataDrivenDBInputFormat.java:60: MIN/MAX bounding query + typed
       splitters)                                             -> read_jdbc
      (partitionColumn/lowerBound/upperBound = the same algorithm built in)
- S13 AutoInputFormat (contrib/streaming AutoInputFormat.java:40)
                                                              -> read_auto
- K1  TextOutputFormat key<sep>value (TextOutputFormat.java:113)
                                                              -> write_kv_text
- K4  MultipleOutputFormat path-from-key
      (mapred/lib/MultipleOutputFormat.java:85)               -> write_partitioned
- K5  MultipleOutputs named side outputs
      (mapred/lib/MultipleOutputs.java:116)                   -> multiple_outputs
- K7  NullOutputFormat (mapred/lib/NullOutputFormat.java:31)  -> null_sink
- K9  FileOutputCommitter temp-dir rename — Spark uses the same Hadoop
      commit protocol; nothing to build.

Scale notes: every reader returns a plain DataFrame scan that Catalyst can
push filters into; writers use partitionBy (hive-style layout) instead of
the per-key filename generator, which is the scalable equivalent.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S1: lines of text. The reference's byte-offset key is positional
    bookkeeping, not data — omitted (add monotonically_increasing_id for an
    explicit surrogate if needed)."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_kv_text(
    spark: SparkSession, path: str, separator: str = "\t"
) -> DataFrame:
    """S2: split each line at the FIRST separator into (key, value); lines
    without the separator become (line, '') — KeyValueLineRecordReader
    semantics (findSeparator / whole-line key)."""
    lines = spark.read.text(path)
    pos = F.instr(F.col("value"), separator)
    # Column APIs only — the separator is always a bound literal, never
    # interpolated into SQL text (quotes/backslashes in it are safe).
    rest = F.col("value").substr(pos + len(separator), F.length("value"))
    return lines.select(
        F.when(pos > 0, F.substring_index(F.col("value"), separator, 1))
        .otherwise(F.col("value"))
        .alias("key"),
        F.when(pos > 0, rest).otherwise(F.lit("")).alias("value"),
    )


def n_line_splits(df: DataFrame, n: int) -> DataFrame:
    """S3: N records per task. In MR this controls split granularity; the
    Spark equivalent is an explicit repartition to ceil(count/n) partitions.
    Requires a count — use only when task granularity genuinely matters
    (e.g. rate-limited per-partition side effects)."""
    total = df.count()
    return df.repartition(max(1, -(-total // n)))


def multiple_inputs(*tagged: tuple[str, DataFrame]) -> DataFrame:
    """S9: per-source DataFrames (each already mapped by its own per-path
    logic — the DelegatingMapper) unioned by column name, missing columns
    null, with a ``_source`` lineage tag."""
    out = None
    for tag, df in tagged:
        cur = df.withColumn("_source", F.lit(tag))
        out = cur if out is None else out.unionByName(cur, allowMissingColumns=True)
    if out is None:
        raise ValueError("no inputs")
    return out


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """S10/S11: JDBC scan. With a partition column this is exactly
    DataDrivenDBInputFormat's MIN/MAX range-split algorithm
    (DataDrivenDBInputFormat.java:184), built into Spark's JDBC source."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def construct_insert_query(table: str, field_names: list[str | None] | None) -> str:
    """K8: DBOutputFormat.constructQuery parity (DBOutputFormat.java:135-168;
    test shape src/test/.../lib/db/TestConstructQuery.java): ``INSERT INTO
    <table> [(f1,f2,...)] VALUES (?,...);`` — the column list is omitted when
    the first field name is null (the reference's positional mode)."""
    if field_names is None:
        raise ValueError("Field names may not be null")
    q = f"INSERT INTO {table}"
    if field_names and field_names[0] is not None:
        q += " (" + ",".join(field_names) + ")"
    return q + " VALUES (" + ",".join("?" for _ in field_names) + ");"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """K8: DBOutputFormat sink over ``df.write.jdbc``. The reference's
    DBRecordWriter batches rows on the prepared INSERT built by
    ``construct_insert_query`` and commits on close (DBOutputFormat.java:66-110);
    Spark's JDBC sink executes the same positional INSERT per partition,
    ``batchsize`` rows per round-trip. ``num_partitions`` caps concurrent
    connections — at cluster scale an unthrottled 1000-task write would open
    1000 sessions against one database."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def _sniff_magic_local(path: str) -> bytes:
    if os.path.isfile(path):
        with open(path, "rb") as fh:
            return fh.read(4)
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            p = os.path.join(path, name)
            if os.path.isfile(p) and not name.startswith(("_", ".")):
                with open(p, "rb") as fh:
                    return fh.read(4)
    return b""


def _sniff_magic_hadoop(spark: SparkSession, path: str) -> bytes:
    """Head bytes of (the first non-hidden file under) ``path`` read through
    the Hadoop FileSystem API — works for any URI Spark can read (hdfs://,
    s3a://, file://), not just the local filesystem."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    status = fs.getFileStatus(hpath)
    if status.isDirectory():
        target = None
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                target = st.getPath()
                break
        if target is None:
            return b""
        hpath = target
    stream = fs.open(hpath)
    try:
        head = [stream.read() for _ in range(4)]
    finally:
        stream.close()
    return bytes(b for b in head if b >= 0)


def read_auto(spark: SparkSession, path: str) -> DataFrame:
    """S13 AutoInputFormat: sniff the container per file. Parquet magic
    ('PAR1') / SequenceFile magic ('SEQ') / else text. The reference sniffs
    SequenceFile-vs-text the same way (first bytes). Local paths are
    sniffed with plain file I/O; URI paths go through the Hadoop
    FileSystem API so a SequenceFile on hdfs://s3a:// is still detected."""
    local = path.split("://", 1)[0] if "://" in path else None
    if local is None or local == "file":
        magic = _sniff_magic_local(path.removeprefix("file://"))
    else:
        magic = _sniff_magic_hadoop(spark, path)
    if magic == b"PAR1" or path.endswith(".parquet"):
        return spark.read.parquet(path)
    if magic[:3] == b"SEQ":
        rdd = spark.sparkContext.sequenceFile(path)
        return rdd.toDF(["key", "value"])
    return read_text(spark, path)


def write_kv_text(
    df: DataFrame, path: str, separator: str = "\t", compression: str | None = None
) -> None:
    """K1: key<sep>value lines (mapred.textoutputformat.separator). Null key
    or value prints as the empty string, as TextOutputFormat writes nothing
    for a null half."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    out = df.select(F.concat_ws(separator, *cols).alias("value"))
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def write_partitioned(df: DataFrame, path: str, *part_cols: str, fmt: str = "parquet") -> None:
    """K4 MultipleOutputFormat (output path derived from key): hive-style
    partitioned layout — the scalable, catalog-friendly equivalent of
    generateFileNameForKeyValue."""
    df.write.partitionBy(*part_cols).mode("overwrite").format(fmt).save(path)


def multiple_outputs(
    df: DataFrame, sinks: dict[str, tuple[Callable[[DataFrame], DataFrame], str]]
) -> None:
    """K5 MultipleOutputs: N named side outputs from one upstream pass. The
    upstream is cached once; each named sink applies its own projection/
    filter and writes independently (several jobs, one scan)."""
    df.persist()
    try:
        for _name, (transform, path) in sinks.items():
            transform(df).write.mode("overwrite").parquet(path)
    finally:
        df.unpersist()


def null_sink(df: DataFrame) -> None:
    """K7 NullOutputFormat: execute the plan, discard the output."""
    df.write.format("noop").mode("overwrite").save()


def write_sequence_file(df, path: str) -> None:
    """K2 SequenceFileOutputFormat: byte-level compatible SequenceFile
    write via the RDD API (first two columns become key/value Writables).
    Parquet remains the native format; this is the compat path."""
    cols = df.columns[:2]
    df.select(*cols).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file(spark, path: str):
    """S4 SequenceFileInputFormat: byte-level compatible read back into a
    (key, value) DataFrame."""
    return spark.createDataFrame(
        spark.sparkContext.sequenceFile(path), "key string, value string"
    )


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC columnar sink (the other first-class Hadoop-ecosystem columnar
    container besides parquet; Hive-default). Spark's native ORC writer
    keeps column statistics + predicate-pushdown indexes, so a table
    written here reads back with the same pruning guarantees as parquet
    (tests assert the pushed filter). ``partition_by`` maps to the
    directory-partitioned layout (K4 MultipleOutputFormat idiom)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar scan with full pushdown/pruning (Spark-native)."""
    return spark.read.orc(path)


def compact_small_files(
    spark: SparkSession,
    src_glob: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
) -> DataFrame:
    """HAR-style small-file compaction (HadoopArchives.java:77,454; §1.3 —
    many small files -> one indexed archive). Reads every text file the
    glob matches, rewrites them as a few large parquet parts carrying
    (src_path, line), and writes a ``_manifest`` table (the HAR index
    analog: src_path -> line count) under the destination.

    Part count = ceil(total input bytes / target_file_bytes), sized from
    FileSystem metadata (a driver-side listing, O(files) like the
    reference's archive planner — no data pass). Returns the manifest.

    Reading back one archived file is a pushed-down filter on src_path
    (the manifest tells which part holds it, but parquet row-group
    pruning on the sorted src_path column already skips the rest).

    Skew bound: rows are bucketed by hash(src_path), and one source file
    never splits across parts — a single file larger than
    target_file_bytes (or many files hashing to one bucket) yields an
    oversized part. Fine for the many-SMALL-files problem this solves;
    don't point it at files that are already large."""
    from pyspark.sql.utils import AnalysisException

    # Distributed metadata listing via the binaryFile source (path/length
    # only — content is never read when the column isn't selected). Avoids
    # private _jvm/_jsc handles and scales past driver-side listings.
    try:
        total = (
            spark.read.format("binaryFile")
            .load(src_glob)
            .agg(F.sum("length"))
            .first()[0]
        )
    except AnalysisException as ex:
        raise FileNotFoundError(
            f"compact_small_files: no files match {src_glob!r}"
        ) from ex
    if not total:
        raise FileNotFoundError(
            f"compact_small_files: no non-empty files match {src_glob!r}"
        )
    parts = max(1, -(-total // target_file_bytes))
    lines = (
        spark.read.text(src_glob)
        .select(
            F.input_file_name().alias("src_path"),
            F.col("value").alias("line"),
        )
    )
    (
        lines.repartition(parts, "src_path")
        .sortWithinPartitions("src_path")
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "data"))
    )
    manifest = (
        spark.read.parquet(os.path.join(dst, "data"))
        .groupBy("src_path")
        .agg(F.count("*").cast("long").alias("n_lines"))
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(dst, "_manifest")
    )
    return spark.read.parquet(os.path.join(dst, "_manifest"))


def read_archived_file(spark: SparkSession, dst: str, src_path: str) -> DataFrame:
    """Point lookup into a compacted archive: filter on the sorted
    src_path column — pushed to the scan, row groups pruned by min/max."""
    return (
        spark.read.parquet(os.path.join(dst, "data"))
        .where(F.col("src_path") == src_path)
        .select("line")
    )


def write_bloom_map(
    df: DataFrame,
    path: str,
    key_col: str,
    expected_ndv: int | None = None,
) -> None:
    """K3+/BloomMapFile parity (io/BloomMapFile.java:45,73): sorted-by-key
    parts (MapFile index -> parquet min/max row-group pruning) PLUS a
    parquet bloom filter on the key column — the dynamic-bloom membership
    pre-test that lets point lookups skip row groups whose min/max range
    covers the key but which cannot contain it."""
    writer = (
        df.repartition(key_col)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .option(f"parquet.bloom.filter.enabled#{key_col}", "true")
    )
    if expected_ndv is not None:
        writer = writer.option(
            f"parquet.bloom.filter.expected.ndv#{key_col}", str(expected_ndv)
        )
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one object per line — the interchange format of
    most LLM data tooling). Spark's native json writer; schema travels
    in the values, so downstream consumers need no sidecar."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines scan. Pass an explicit DDL ``schema`` in production —
    schema inference is a full extra pass over the data (fine locally,
    wrong at 100 TB) and column types can drift per-file without it."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """CSV sink (header on by default). Quoting/escaping are Spark's
    RFC-4180 defaults; use parquet/ORC for anything typed — CSV is the
    interchange/export path only."""
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    sep: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV scan. Pass a DDL ``schema`` in production (inference = an
    extra full pass, same rule as read_jsonl). ``mode`` is the
    bad-record policy — PERMISSIVE (null out bad fields), DROPMALFORMED
    (skip the row: the SkipBadRecords idiom for self-describing text),
    or FAILFAST."""
    r = spark.read.option("header", header).option("sep", sep).option("mode", mode)
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def db_split_intervals(df: DataFrame, col: str, num_splits: int) -> DataFrame:
    """S11 DataDrivenDBInputFormat's IntegerSplitter, as a relation.

    The reference's split algorithm (mapreduce/lib/db/IntegerSplitter.java:
    104-131): splitSize = (max - min) / numSplits floored, minimum 1;
    boundary points min, min+s, min+2s, ... while <= max; max appended when
    the walk did not land on it (or only one point was produced).  Every
    interval is [lo, hi) except the last, which is closed [lo, hi]
    (IntegerSplitter.java:66-80) — the no-loss/no-dup contract
    tests/test_jdbc.py pins for the live JDBC path.

    Returns (split_id INT 1-based, lo BIGINT, hi BIGINT, closed BOOLEAN),
    computed entirely in-plan (one min/max aggregate; no driver collect) so
    it composes with a count-per-split probe as a broadcast join."""
    mm = df.agg(
        F.min(F.col(col)).cast("bigint").alias("_lo"),
        F.max(F.col(col)).cast("bigint").alias("_hi"),
    )
    # exact long division (Java `/` on longs) — not double floor, which
    # loses precision past 2^53
    step = F.expr(f"greatest((_hi - _lo) div {int(num_splits)}, 1L)")
    pts = F.sequence(F.col("_lo"), F.col("_hi"), step)
    pts = F.when(
        (F.element_at(pts, -1) != F.col("_hi")) | (F.size(pts) == 1),
        F.concat(pts, F.array(F.col("_hi"))),
    ).otherwise(pts)
    with_pts = mm.select(pts.alias("_pts"))
    iv = with_pts.select(
        F.posexplode(
            F.transform(
                F.slice(F.col("_pts"), 1, F.size("_pts") - 1),
                lambda lo, i: F.struct(
                    lo.alias("lo"),
                    F.element_at(F.col("_pts"), i + 2).alias("hi"),
                    (i == F.size("_pts") - 2).alias("closed"),
                ),
            )
        ).alias("_i", "s")
    )
    return iv.select(
        (F.col("_i") + 1).cast("int").alias("split_id"),
        F.col("s.lo").alias("lo"),
        F.col("s.hi").alias("hi"),
        F.col("s.closed").alias("closed"),
    )


# --- S11 typed splitters (DataDrivenDBInputFormat's DBSplitter family) ----
# The reference computes split points DRIVER-side from a one-row MIN/MAX
# resultset (DataDrivenDBInputFormat.java:184); these are the same tiny
# planning functions, with db_split_intervals above as the in-plan
# relational twin for integer keys.  Each split point list is one element
# longer than the split count; every interval is [lo, hi) except the
# closed last (IntegerSplitter.java:96-104).

from decimal import ROUND_HALF_UP, Decimal, localcontext  # noqa: E402

# new BigDecimal(10000 * Double.MIN_VALUE): 10000 * 2^-1074, exact in
# binary, taken verbatim (BigDecimalSplitter.java:95)
_MIN_INCREMENT = Decimal(10000 * 5e-324)
_ONE_PLACE = Decimal(65536)
_MAX_CHARS = 8


def integer_split_points(num_splits: int, min_val: int, max_val: int) -> list[int]:
    """IntegerSplitter.split(long,long,long) (IntegerSplitter.java:104):
    floor-divided step (min 1), walk while <= max, append max when the
    walk missed it or only one point was produced."""
    step = max((max_val - min_val) // max(num_splits, 1), 1)
    pts = list(range(min_val, max_val + 1, step))
    if pts[-1] != max_val or len(pts) == 1:
        pts.append(max_val)
    return pts


def date_split_points(num_splits: int, min_ms: int, max_ms: int) -> list[int]:
    """DateSplitter: date/time are longs in Java (epoch millis via
    java.sql Date/Time/Timestamp.getTime, DateSplitter.java:82-100), so
    the split walk IS the integer walk."""
    return integer_split_points(num_splits, min_ms, max_ms)


# Java BigDecimal +,-,* are arbitrary-precision-exact; Python Decimal
# rounds EVERY operation to the context precision (default 28 — enough to
# corrupt the third base-65536 digit of a string fraction). All splitter
# arithmetic runs under this context: 8 chars deep the exact fractions
# need ~16*8 decimal digits (denominator 2^128), well inside 400.
_PREC = 400


def _try_divide(numerator: Decimal, denominator: Decimal) -> Decimal:
    """BigDecimalSplitter.tryDivide (BigDecimalSplitter.java:100): exact
    quotient when one exists, else round HALF_UP at the NUMERATOR's scale
    (Java divide(d, ROUND_HALF_UP) keeps this.scale())."""
    with localcontext() as ctx:
        ctx.prec = _PREC
        q = numerator / denominator
        if q * denominator == numerator:
            return q
        scale = max(-numerator.as_tuple().exponent, 0)
        return (numerator / denominator).quantize(
            Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
        )


def decimal_split_points(
    num_splits: int, min_val: Decimal, max_val: Decimal
) -> list[Decimal]:
    """BigDecimalSplitter.split (BigDecimalSplitter.java:120-147): the
    integer walk generalized to decimals, with the step floored at
    MIN_INCREMENT = 10000 * Double.MIN_VALUE instead of 1."""
    with localcontext() as ctx:
        ctx.prec = _PREC
        step = _try_divide(max_val - min_val, Decimal(max(num_splits, 1)))
        if step < _MIN_INCREMENT:
            step = _MIN_INCREMENT
        pts: list[Decimal] = []
        cur = min_val
        while cur <= max_val:
            pts.append(cur)
            cur = cur + step
        if pts[-1] != max_val or len(pts) == 1:
            pts.append(max_val)
        return pts


def string_to_decimal(s: str) -> Decimal:
    """TextSplitter.stringToBigDecimal (TextSplitter.java:191): interpret
    the string as the fraction 0.s0 s1 ... in base 65536, first MAX_CHARS
    UTF-16 units only (rounding-error guard).  BMP contract: the Java
    loop calls codePointAt(i) per CHAR index, so astral chars would be
    double-counted there too — keys are expected BMP text."""
    with localcontext() as ctx:
        ctx.prec = _PREC
        result = Decimal(0)
        cur_place = _ONE_PLACE
        for ch in s[:_MAX_CHARS]:
            result += _try_divide(Decimal(ord(ch)), cur_place)
            cur_place *= _ONE_PLACE
        return result


def decimal_to_string(bd: Decimal) -> str:
    """TextSplitter.bigDecimalToString (TextSplitter.java:212): peel one
    base-65536 digit per round, stop at a zero digit or MAX_CHARS."""
    with localcontext() as ctx:
        ctx.prec = _PREC
        cur = bd.normalize()
        out: list[str] = []
        for _ in range(_MAX_CHARS):
            cur = cur * _ONE_PLACE
            code = int(cur)
            if code == 0:
                break
            cur -= Decimal(code)
            out.append(chr(code))
        return "".join(out)


def text_split_points(
    num_splits: int, min_str: str, max_str: str, common_prefix: str = ""
) -> list[str]:
    """TextSplitter.split(int,String,String,String) (TextSplitter.java:
    143-168): map both endpoints into [0, 1) base-65536 fractions, run
    the BigDecimal walk, map the points back, and force the literal
    user endpoints onto both ends of the list.  The caller strips the
    common prefix first (TextSplitter.java:100-113)."""
    pts = decimal_split_points(
        num_splits, string_to_decimal(min_str), string_to_decimal(max_str)
    )
    out = [common_prefix + decimal_to_string(p) for p in pts]
    if not out or out[0] != common_prefix + min_str:
        out.insert(0, common_prefix + min_str)
    if len(out) == 1 or out[-1] != common_prefix + max_str:
        out.append(common_prefix + max_str)
    return out


def boolean_splits(
    min_val: bool | None, max_val: bool | None
) -> list[tuple[str, str]]:
    """BooleanSplitter (BooleanSplitter.java:36-71): at most three
    point splits — (= FALSE), (= TRUE), and (IS NULL) when an extremum
    is null.  Returned as (low_clause, high_clause) predicate pairs on a
    placeholder column ``$col``."""
    if min_val is None and max_val is None:
        return [("$col IS NULL", "$col IS NULL")]
    splits: list[tuple[str, str]] = []
    if not bool(min_val):
        splits.append(("$col = FALSE", "$col = FALSE"))
    if bool(max_val):
        splits.append(("$col = TRUE", "$col = TRUE"))
    if min_val is None or max_val is None:
        splits.append(("$col IS NULL", "$col IS NULL"))
    return splits
