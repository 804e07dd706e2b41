"""Synthetic data generators (SURVEY.md §2.1 S14-S16).

Reference parity:
- TeraGen.RangeInputFormat: a no-input source of row ids
  (examples/terasort/TeraGen.java:65) -> spark.range — the generators here
  all start from it, so generation is fully distributed (no driver data).
- TeraGen 100-byte rows: 10-byte key + rowid + filler
  (terasort/TeraGen.java:50,60,186) -> teragen().
- RandomWriter (random bytes KV, examples/RandomWriter.java:85) and
  RandomTextWriter (random word sequences, RandomTextWriter.java:82)
  -> random_writer / random_text_writer. Randomness is a deterministic
  per-row hash stream (seeded), so runs are reproducible — the property the
  reference gets from seeding Random per task.
- EmptyInputFormat (src/test/.../EmptyInputFormat.java) -> empty().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# RandomTextWriter draws from a fixed 100-word list
# (RandomTextWriter.java:82 "words" array); a small deterministic lexicon
# keeps parity of shape without copying the list.
_LEXICON_SIZE = 100


def empty(spark: SparkSession, schema: str = "key string, value string") -> DataFrame:
    """S15: the empty relation with an explicit schema."""
    return spark.createDataFrame([], schema)


def _hash_stream(col, seed: int, i: int):
    """Deterministic well-mixed 64-bit stream: xxhash64 of (row id, seed, i)."""
    return F.xxhash64(col, F.lit(seed), F.lit(i))


def teragen(spark: SparkSession, num_rows: int, partitions: int | None = None) -> DataFrame:
    """TeraGen: row id -> (10-char key from a seeded hash, 10-digit rowid,
    78-char filler) — the 100-byte record layout of TeraGen.java:50,60."""
    rng = spark.range(0, num_rows, numPartitions=partitions)
    key = F.substring(F.md5(F.col("id").cast("string")), 1, 10)
    rowid = F.lpad(F.col("id").cast("string"), 10, "0")
    filler = F.rpad(F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 26), 78, "A")
    return rng.select(key.alias("key"), F.concat(rowid, filler).alias("value"))


def random_writer(
    spark: SparkSession,
    num_rows: int,
    seed: int = 42,
    min_key_len: int = 10,
    max_key_len: int = 1000,
    min_val_len: int = 0,
    max_val_len: int = 10000,
    partitions: int | None = None,
) -> DataFrame:
    """RandomWriter: random-length binary-ish KV records (RandomWriter.java:85
    key 10..1000 bytes, value 0..10000 bytes). Lengths and payloads derive
    from the seeded hash stream; payload = repeated hash hex to the target
    length (content entropy is irrelevant to the sort/shuffle workloads this
    feeds)."""
    rng = spark.range(0, num_rows, numPartitions=partitions)
    klen = (F.pmod(_hash_stream(F.col("id"), seed, 1), F.lit(max_key_len - min_key_len + 1)) + min_key_len).cast("int")
    vlen = (F.pmod(_hash_stream(F.col("id"), seed, 2), F.lit(max_val_len - min_val_len + 1)) + min_val_len).cast("int")
    kseed = F.md5(F.concat(F.col("id").cast("string"), F.lit(f":k{seed}")))
    vseed = F.md5(F.concat(F.col("id").cast("string"), F.lit(f":v{seed}")))
    key = F.substring(F.repeat(kseed, (klen / 32 + 1).cast("int")), 1, klen)
    value = F.substring(F.repeat(vseed, (vlen / 32 + 1).cast("int")), 1, vlen)
    return rng.select(key.cast("binary").alias("key"), value.cast("binary").alias("value"))


def random_text_writer(
    spark: SparkSession,
    num_rows: int,
    seed: int = 42,
    min_words_key: int = 5,
    max_words_key: int = 10,
    min_words_value: int = 20,
    max_words_value: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """RandomTextWriter: keys of 5-10 random words, values of 20-100 random
    words (RandomTextWriter.java:82; the gridmix VARCOMPSEQ shape). Words are
    'wordNN' drawn deterministically from a 100-word lexicon by the seeded
    hash stream."""
    rng = spark.range(0, num_rows, numPartitions=partitions)

    def words(n_col, salt: int):
        idx = F.sequence(F.lit(1), n_col)
        pick = F.transform(
            idx,
            lambda j: F.concat(
                F.lit("word"),
                F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt), j), F.lit(_LEXICON_SIZE)).cast("string"),
            ),
        )
        return F.array_join(pick, " ")

    kn = (F.pmod(_hash_stream(F.col("id"), seed, 3), F.lit(max_words_key - min_words_key + 1)) + min_words_key).cast("int")
    vn = (F.pmod(_hash_stream(F.col("id"), seed, 4), F.lit(max_words_value - min_words_value + 1)) + min_words_value).cast("int")
    return rng.select(words(kn, 5).alias("key"), words(vn, 6).alias("value"))
