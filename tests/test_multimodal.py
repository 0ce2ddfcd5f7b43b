"""Tests for multimodal binary-column plumbing (stubbed decode, real Spark
schemas/batching/partitioning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.multimodal import (
    attach_media_metadata,
    extract_image_features,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"jpegdata" * 50),
        (2, b"\x89PNG\r\n\x1a\n" + b"pngdata" * 80),
        (3, b"RIFF" + b"wavdata" * 30),
        (4, b"unknownpayload" * 10),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_metadata_sniffing_jvm_side(spark, media):
    out = {r.media_id: r for r in attach_media_metadata(media).collect()}
    assert out[1].sniffed_format == "jpeg"
    assert out[2].sniffed_format == "png"
    assert out[3].sniffed_format == "wav"
    assert out[4].sniffed_format == "unknown"
    assert out[1].n_bytes == 4 + 8 * 50


def test_image_features_deterministic_across_partitionings(spark, media):
    one = extract_image_features(media.coalesce(1)).collect()
    many = extract_image_features(media.repartition(4)).collect()
    key = lambda rows: sorted((r.media_id, tuple(r.embedding)) for r in rows)
    assert key(one) == key(many)
    r = {x.media_id: x for x in one}[1]
    assert len(r.embedding) == 16
    assert all(-0.5 <= v <= 0.5 for v in r.embedding)
    assert 0.0 <= r.mean_luma <= 1.0


def test_unstubbed_decode_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        extract_image_features(media, decode_stub=False).collect()


def test_resize_shrinks_payload(spark, media):
    out = {r.media_id: r for r in resize_images(media, max_side=1).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(out[2].payload) <= len(src[2].payload)


def test_frame_sampling_one_to_many(spark, media):
    frames = sample_video_frames(media, every_n=2, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert all(1 <= len(v) <= 3 for v in by_id.values())
    # frames reassemble a prefix of the original payload
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    f1 = sorted(by_id[1], key=lambda r: r.frame_index)
    joined = b"".join(bytes(r.frame_payload) for r in f1)
    assert src[1].startswith(joined[: len(joined) // 2])


def test_extract_audio_windows_shapes(spark):
    from bankcreditunion_datapipeline_spark.operators.multimodal import (
        extract_audio_windows,
    )

    rows = [
        (1, bytes(range(256)) * 20),   # 5120 bytes -> 2 windows of 4096/1024
        (2, b"\x10" * 100),            # tiny -> 1 window
        (3, b"\xff" * 4096 * 20),      # long -> capped at max_windows
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in extract_audio_windows(df, max_windows=4).collect()}
    assert out[1].n_windows == 2 and len(out[1].window_energy) == 2
    assert out[1].window_energy[0] == sum(range(256)) / 256  # deterministic stub
    assert out[2].n_windows == 1 and out[2].window_energy == [16.0]
    assert out[3].n_windows == 4  # truncated at max_windows
    assert out[3].window_energy == [255.0] * 4
