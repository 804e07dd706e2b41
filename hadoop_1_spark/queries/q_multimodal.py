"""Multimodal-column queries (north-star extensions): manifest with format
sniffing, Arrow-batched feature extraction (a Pandas-UDF path verified
against a SQL oracle), resize planning, and video frame sampling.

The oracle reproduces the deterministic media synthesis (magic-prefixed
utf8 payloads derived from documents) so even the mapInPandas decode path
is hash-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_1_spark.operators import multimodal
from hadoop_1_spark.registry import _load, register


def _blob_literal(b: bytes) -> str:
    return "'" + "".join(f"\\x{x:02X}" for x in b) + "'::BLOB"


_MAGIC_CASE = (
    "CASE media_id % 3 "
    f"WHEN 0 THEN {_blob_literal(multimodal.MAGICS['image'])} "
    f"WHEN 1 THEN {_blob_literal(multimodal.MAGICS['audio'])} "
    f"ELSE {_blob_literal(multimodal.MAGICS['video'])} END"
)

_MEDIA_CTE = f"""
media AS (
  SELECT doc_id AS media_id,
    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
    CAST(n_chars % 640 + 16 AS INT) AS width,
    CAST(n_chars % 480 + 16 AS INT) AS height,
    CAST(n_chars * 40 AS BIGINT) AS duration_ms,
    text
  FROM documents
),
blobs AS (
  SELECT *, ({_MAGIC_CASE}) || encode(text) AS content FROM media
)
"""

_SNIFF_CASE = " ".join(
    f"WHEN hex(content) LIKE '{multimodal.MAGICS[m].hex().upper()}%' THEN '{m}'"
    for m in multimodal.MODALITIES
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.synthesize_media(_load(spark, sf_dir, "documents"))


@register(
    "mm_manifest",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT modality,
       CASE {_SNIFF_CASE} ELSE 'unknown' END AS sniffed,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(octet_length(content)) AS BIGINT) AS total_bytes,
       max(width) AS max_width
FROM blobs
GROUP BY 1, 2
""",
)
def mm_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media manifest: modality x sniffed-format rollup. Format comes from
    magic bytes (sniff_format), not the modality tag — the check that blob
    dispatch actually reads content."""
    from pyspark.sql import functions as F

    m = _media(spark, sf_dir)
    return (
        m.select(
            "modality",
            multimodal.sniff_format(F.col("content")).alias("sniffed"),
            F.length("content").alias("nbytes"),
            F.col("meta.width").alias("width"),
        )
        .groupBy("modality", "sniffed")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("nbytes").cast("long").alias("total_bytes"),
            F.max("width").alias("max_width"),
        )
    )


@register(
    "mm_features",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT media_id, modality,
       CAST(octet_length(content) AS BIGINT) AS byte_len,
       md5(hex(content)) AS digest,
       ('0x' || substr(md5(hex(content)), 1, 2))::INT / 256.0 AS brightness
FROM blobs
""",
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched (mapInPandas) feature extraction over the blob column
    — the Python decode path, hash-verified against the SQL oracle."""
    return multimodal.extract_features(_media(spark, sf_dir))


@register(
    "mm_resize_plan",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT media_id, modality, width, height,
       CASE WHEN greatest(width, height) <= 256 THEN width
            ELSE CAST(floor(width * 256.0 / greatest(width, height)) AS INT) END AS target_width,
       CASE WHEN greatest(width, height) <= 256 THEN height
            ELSE CAST(floor(height * 256.0 / greatest(width, height)) AS INT) END AS target_height
FROM media
""",
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning — metadata-only (blob column pruned at the scan)."""
    return multimodal.resize_meta(_media(spark, sf_dir), max_side=256)


@register(
    "mm_frame_sample",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT media_id, unnest(range(0, duration_ms, 1000)) AS frame_ts_ms
FROM media WHERE modality = 'video'
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp (1 fps)."""
    return multimodal.frame_sample(_media(spark, sf_dir), fps_ms=1000)


@register(
    "mm_dedup",
    oracle=f"""
WITH {_MEDIA_CTE.strip().rstrip()},
h AS (SELECT media_id, md5(hex(content)) AS digest FROM blobs),
c AS (SELECT digest, min(media_id) AS canonical_id FROM h GROUP BY 1)
SELECT h.media_id, h.digest, c.canonical_id,
       h.media_id <> c.canonical_id AS is_dup
FROM h JOIN c USING (digest)
""",
)
def mm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup over media blobs: identical bytes map to
    one canonical media_id (duplicate documents that share a modality
    slot collide; the blob column never leaves the JVM)."""
    return multimodal.content_hash_dedup(_media(spark, sf_dir))


AC_WINDOW_MS = 30_000
AC_STRIDE_MS = 25_000


@register(
    "mm_audio_chunks",
    oracle=f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         n_chars * 40 AS duration_ms,
         16000 AS sample_rate
  FROM documents
),
c AS (
  SELECT media_id, CAST(i AS INT) AS chunk_idx,
         CAST(i * {AC_STRIDE_MS} AS BIGINT) AS start_ms,
         duration_ms, sample_rate
  FROM media, unnest(range(0, (duration_ms + {AC_STRIDE_MS} - 1) // {AC_STRIDE_MS})) t(i)
  WHERE modality = 'audio'
)
SELECT media_id, chunk_idx, start_ms,
       CAST(least(start_ms + {AC_WINDOW_MS}, duration_ms) AS BIGINT) AS end_ms,
       CAST(start_ms * sample_rate // 1000 AS BIGINT) AS start_sample,
       CAST(least(start_ms + {AC_WINDOW_MS}, duration_ms) * sample_rate // 1000 AS BIGINT) AS end_sample
FROM c
""",
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided ASR chunking plan over the audio rows (30 s windows every
    25 s): exact ms + sample offsets from metadata only — the blob never
    enters the plan (multimodal.audio_chunks). The oracle re-derives the
    synthetic media metadata and replays the stride arithmetic."""
    media = multimodal.synthesize_media(_load(spark, sf_dir, "documents"))
    return multimodal.audio_chunks(
        media, window_ms=AC_WINDOW_MS, stride_ms=AC_STRIDE_MS
    )
