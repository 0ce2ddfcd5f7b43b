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


def _make_wav(samples: list[int], framerate: int = 8000) -> bytes:
    """16-bit mono PCM WAV from int16 samples, stdlib-only."""
    import array
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(array.array("h", samples).tobytes())
    return buf.getvalue()


def test_audio_real_wav_decode_golden(spark):
    """The REAL (non-stub) audio path: stdlib wave decodes 16-bit PCM, so
    this golden test runs even in the codec-less container. Expected RMS
    computed independently in Python over the same samples."""
    import math

    from bankcreditunion_datapipeline_spark.operators.multimodal import (
        extract_audio_windows,
    )

    samples = [0, 16384, -16384, 32767, -32768, 100, -100, 5000] * 512  # 4096
    wav = _make_wav(samples)
    df = spark.createDataFrame([(1, wav)], "media_id long, payload binary")
    # window_bytes=2048 -> 1024 samples/window -> 4 windows
    out = extract_audio_windows(
        df, window_bytes=2048, max_windows=8, decode_stub=False
    ).collect()[0]
    assert out.n_windows == 4
    expected = [
        math.sqrt(sum(s * s for s in samples[k * 1024 : (k + 1) * 1024]) / 1024)
        / 32768.0
        for k in range(4)
    ]
    assert out.window_energy == pytest.approx(expected, abs=1e-12)


def test_audio_real_decode_rejects_non_wav(spark):
    from bankcreditunion_datapipeline_spark.operators.multimodal import (
        extract_audio_windows,
    )

    df = spark.createDataFrame(
        [(1, b"\x00not-riff-data" * 100)], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="only PCM WAV"):
        extract_audio_windows(df, decode_stub=False).collect()


def _tiny_png() -> bytes:
    """4x4 grayscale PNG built with stdlib zlib/struct (no PIL needed to
    CONSTRUCT it; PIL is only needed to decode it)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # 4x4, 8-bit gray
    # 4 scanlines, filter byte 0 + 4 pixels each; values 0..255 ramp
    scan = b"".join(
        b"\x00" + bytes([r * 64 + c * 16 for c in range(4)]) for r in range(4)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def test_image_real_decode_golden_png(spark):
    """Real PIL decode path, golden-checked on a hand-built 4x4 PNG.
    Skips where PIL is not installed (this container) -- the same
    feature-probe pattern as the delta gold-path test."""
    pytest.importorskip("PIL")
    png = _tiny_png()
    df = spark.createDataFrame([(1, png)], "media_id long, payload binary")
    out = extract_image_features(df, dim=16, decode_stub=False).collect()[0]
    pixels = [r * 64 + c * 16 for r in range(4) for c in range(4)]
    assert out.mean_luma == pytest.approx(sum(pixels) / 16 / 255.0, abs=1e-9)
    # 4x4 thumbnail of a 4x4 image is the image itself
    assert out.embedding == pytest.approx(
        [p / 255.0 - 0.5 for p in pixels], abs=1e-6
    )


def test_image_real_resize_roundtrip(spark):
    pytest.importorskip("PIL")
    png = _tiny_png()
    df = spark.createDataFrame([(1, png)], "media_id long, payload binary")
    out = resize_images(df, max_side=2, decode_stub=False).collect()[0]
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(bytes(out.payload)))
    assert img.size == (2, 2)
