"""Multimodal plumbing (multimodal.py) vs DuckDB oracle + unit checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_1_spark.operators import multimodal
from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize(
    "name", ["mm_manifest", "mm_features", "mm_resize_plan", "mm_frame_sample"]
)
def test_multimodal_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_sniff_format_reads_magic_bytes(spark):
    df = spark.createDataFrame(
        [
            (1, multimodal.MAGICS["image"] + b"payload"),
            (2, multimodal.MAGICS["audio"] + b"wav"),
            (3, multimodal.MAGICS["video"] + b"mp4"),
            (4, b"garbage"),
        ],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: r["fmt"]
        for r in df.select("media_id", multimodal.sniff_format(F.col("content")).alias("fmt")).collect()
    }
    assert got == {1: "image", 2: "audio", 3: "video", 4: "unknown"}


def test_decode_real_is_a_marked_seam():
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"\x89PNG", "image")


def test_extract_features_batch_shape(spark):
    """mapInPandas output schema + deterministic kernel across partitions."""
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 10 + i) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).repartition(4)
    feats = multimodal.extract_features(multimodal.synthesize_media(docs))
    assert feats.columns == ["media_id", "modality", "byte_len", "digest", "brightness"]
    rows = feats.collect()
    assert len(rows) == 20
    assert all(0.0 <= r["brightness"] < 1.0 for r in rows)
    assert all(len(r["digest"]) == 32 for r in rows)


def test_content_hash_dedup_marks_identical_blobs(spark):
    from hadoop_1_spark.operators import multimodal

    df = spark.createDataFrame(
        [
            (1, bytearray(b"\x89PNG\r\n\x1a\nAAA")),
            (2, bytearray(b"\x89PNG\r\n\x1a\nAAA")),  # identical to 1
            (3, bytearray(b"\x89PNG\r\n\x1a\nBBB")),
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in multimodal.content_hash_dedup(df).collect()}
    assert rows[1].canonical_id == 1 and not rows[1].is_dup
    assert rows[2].canonical_id == 1 and rows[2].is_dup
    assert rows[3].canonical_id == 3 and not rows[3].is_dup
    assert rows[1].digest == rows[2].digest != rows[3].digest


def test_mm_audio_chunks_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "mm_audio_chunks")


def test_audio_chunks_arithmetic(spark):
    """duration 70s @16kHz, 30s window / 25s stride -> chunks at 0/25/50s;
    the last chunk truncates at 70s; sample offsets = ms*16."""
    from hadoop_1_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(1, "audio", 70_000, 16_000)],
        "media_id long, modality string, duration_ms long, sample_rate int",
    ).select(
        "media_id", "modality",
        F.struct("duration_ms", "sample_rate").alias("meta"),
    )
    rows = sorted(
        mm.audio_chunks(media).collect(), key=lambda r: r["chunk_idx"]
    )
    got = [(r["start_ms"], r["end_ms"], r["start_sample"], r["end_sample"]) for r in rows]
    assert got == [
        (0, 30_000, 0, 480_000),
        (25_000, 55_000, 400_000, 880_000),
        (50_000, 70_000, 800_000, 1_120_000),
    ]


def test_audio_chunks_zero_duration_yields_no_rows(spark):
    """duration_ms = 0 must produce zero chunks, not an illegal-sequence
    crash (F.sequence(0, -1, stride))."""
    from hadoop_1_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(1, "audio", 0, 16_000), (2, "audio", 1000, 16_000)],
        "media_id long, modality string, duration_ms long, sample_rate int",
    ).select(
        "media_id", "modality",
        F.struct("duration_ms", "sample_rate").alias("meta"),
    )
    rows = mm.audio_chunks(media).collect()
    assert [r["media_id"] for r in rows] == [2]
    assert (rows[0]["start_ms"], rows[0]["end_ms"]) == (0, 1000)
