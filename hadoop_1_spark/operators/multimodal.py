"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (north-star extension, BASELINE.json).

Media lives as an opaque `binary` content column plus a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched Pandas UDFs over mapInPandas. The decode *kernels* are
deterministic fakes (this container has no image/audio libs — a real
deployment swaps `_fake_decode_stats` for PIL/ffmpeg behind the same
signature; `decode_real` raises NotImplementedError to mark the seam).
The Spark-side plumbing — schema, batch shape, partitioning — is real and
oracle-tested.

Scale notes (100 TB design intent):
- content bytes never hit the driver; every op is per-partition streaming
  (mapInPandas) or built-in column exprs.
- metadata-only ops (manifest, frame sampling) NEVER touch the binary
  column — column pruning drops it at the parquet scan, which is the
  difference between scanning terabytes and scanning megabytes.
- mapInPandas batches are bounded by spark.sql.execution.arrow
  .maxRecordsPerBatch; blobs stay inside Arrow buffers (no per-row Python
  object churn).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")

# (modality, magic prefix) — the synthetic payloads are tagged with real
# container magics so format sniffing exercises true byte-level dispatch.
MAGICS = {
    "image": b"\x89PNG\r\n\x1a\n",
    "audio": b"RIFF",
    "video": b"\x00\x00\x00\x18ftyp",
}

FEATURE_SCHEMA = (
    "media_id long, modality string, byte_len long, digest string, brightness double"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: content =
    magic-prefixed utf8 text bytes; metadata from n_chars. Stands in for a
    real ingest (S3 blobs + sidecar metadata) with identical shape."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    magic = F.element_at(
        F.array(*[F.lit(MAGICS[m]) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.concat(magic, F.encode(F.col("text"), "utf-8")).alias("content"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def sniff_format(content: Column) -> Column:
    """Magic-byte format sniffing — pure byte-compare exprs (JVM-side),
    the AutoInputFormat idiom (contrib/streaming AutoInputFormat.java:40)
    applied to media blobs."""
    out = F.lit("unknown")
    for m in reversed(MODALITIES):
        out = F.when(
            F.startswith(content, F.lit(MAGICS[m])), F.lit(m)
        ).otherwise(out)
    return out


def _fake_decode_stats(content: bytes) -> tuple[str, float]:
    """Deterministic fake decode kernel: md5-of-uppercase-hex digest + a
    [0,1) 'brightness' from the first digest byte. (Digest is over the hex
    encoding because the DuckDB oracle has no md5-over-BLOB; hex(blob) is
    the portable contract.) Swap for a real decoder behind the same
    (bytes) -> stats signature."""
    d = hashlib.md5(content.hex().upper().encode()).hexdigest()
    return d, int(d[:2], 16) / 256.0


def decode_real(content: bytes, modality: str):  # pragma: no cover - seam
    """The real-decoder seam. Container has no PIL/ffmpeg; a deployment
    implements this per modality."""
    raise NotImplementedError(f"no {modality} decoder in this environment")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: byte_len,
    digest, brightness per item. mapInPandas streams whole record batches
    (blobs never become driver objects)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = pdf["content"].map(_fake_decode_stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["content"].map(len).astype("int64"),
                    "digest": stats.map(lambda t: t[0]),
                    "brightness": stats.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (metadata-only): target dims preserving aspect
    ratio, integer math only — never reads content, so the scan prunes the
    blob column entirely."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale_num = F.lit(max_side)
    longest = F.greatest(w, h)
    return media.select(
        "media_id",
        "modality",
        w.alias("width"),
        h.alias("height"),
        # floor (not cast-trunc): DuckDB casts round but floors match on
        # both engines for the positive ratios here
        F.when(longest <= max_side, w)
        .otherwise(F.floor(w * scale_num / longest).cast("int"))
        .alias("target_width"),
        F.when(longest <= max_side, h)
        .otherwise(F.floor(h * scale_num / longest).cast("int"))
        .alias("target_height"),
    )


def frame_sample(media: DataFrame, fps_ms: int = 1000) -> DataFrame:
    """Frame sampling plan for video rows: one row per sampled frame
    timestamp (every fps_ms over duration). Metadata-only explode — the
    downstream decode joins content back by media_id only for sampled
    frames (decode work proportional to samples, not footage)."""
    return (
        media.where(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("meta.duration_ms") - 1, F.lit(fps_ms))
            ).alias("frame_ts_ms"),
        )
    )


def content_hash_dedup(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Exact content-hash dedup over the binary column — the image/audio
    dedup step of a multimodal ingest (identical bytes -> one canonical
    copy). digest = md5(hex(content)): hex() first because the oracle
    engine's md5 is VARCHAR-only, and hex is bit-identical across engines.

    One digest-keyed shuffle (map-side partial min); blobs never leave
    the JVM — the hash is computed in the scan stage and only (id,
    digest) rows shuffle."""
    digest = F.md5(F.hex(F.col("content")))
    hashed = media.select(F.col(id_col), digest.alias("digest"))
    canon = hashed.groupBy("digest").agg(F.min(id_col).alias("canonical_id"))
    return (
        hashed.join(canon, "digest")
        .select(
            id_col,
            "digest",
            "canonical_id",
            (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
        )
    )


def audio_chunks(
    media: DataFrame, window_ms: int = 30_000, stride_ms: int = 25_000
) -> DataFrame:
    """Strided audio chunking plan (the ASR-ingest shape: fixed windows
    with overlap, e.g. 30 s windows every 25 s): one row per chunk with
    exact millisecond and sample offsets derived from metadata only —
    the blob column is never touched, so the plan is a narrow explode
    whose decode work downstream is proportional to chunks actually
    consumed (same contract as frame_sample).

    Sample offsets are exact integers: sample_rate is per-row metadata
    and start_sample = start_ms * sample_rate div 1000 (floor division,
    engine-identical). The final chunk truncates at duration.
    Zero-duration clips yield zero chunks (filtered BEFORE the sequence
    — F.sequence(0, -1, stride) would throw on illegal boundaries)."""
    au = media.where(
        (F.col("modality") == "audio") & (F.col("meta.duration_ms") > 0)
    )
    return au.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("meta.duration_ms") - 1,
                F.lit(stride_ms).cast("long"),
            )
        ).alias("chunk_idx", "start_ms"),
        F.col("meta.duration_ms").alias("_dur"),
        F.col("meta.sample_rate").alias("_sr"),
    ).select(
        "media_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "start_ms",
        F.least(F.col("start_ms") + window_ms, F.col("_dur")).alias("end_ms"),
        F.expr("start_ms * _sr div 1000").cast("bigint").alias("start_sample"),
        F.expr("least(start_ms + " + str(window_ms) + ", _dur) * _sr div 1000")
        .cast("bigint")
        .alias("end_sample"),
    )
