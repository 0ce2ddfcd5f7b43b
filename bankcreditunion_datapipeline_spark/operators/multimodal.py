"""Multimodal (image/audio/video) column handling.

Representation: media is an opaque `binary` column plus typed metadata
(media_type, format, width/height/duration, byte length) -- the pattern that
scales: payloads stay columnar in parquet, metadata predicates prune without
touching bytes, and compute happens in Arrow-batched pandas UDFs via
mapInPandas (one Python worker hop per batch, not per row).

Codec strategy (mirrors the delta-spark probe in sinks.py): with
`decode_stub=False` each kernel FEATURE-PROBES its real codec at the batch
level and uses it when importable -- PIL for image decode/resize, stdlib
`wave` for PCM WAV (no external dependency, so the real audio path runs
even in this container), ffmpeg for video. A missing codec raises
NotImplementedError at the documented seam. `decode_stub=True` (default
here) derives deterministic fake features from the bytes so the Spark-side
plumbing -- schemas, batch iteration, partitioning, UDF signatures -- is
exercised regardless of what is installed. PIL/ffmpeg are absent from
this container and installs are disallowed; the PIL golden tests
skip-mark themselves exactly like the delta gold-path test.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # 'image' | 'audio' | 'video'
        StructField("format", StringType()),  # 'jpeg' | 'png' | 'wav' | 'mp4' ...
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),  # images/video; NULL otherwise
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),  # audio/video; NULL otherwise
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        # double, not float: a float32 round-trip perturbs the 6th decimal,
        # which the oracle (bit-identical double arithmetic) would catch
        StructField("mean_luma", DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake embedding from payload bytes (stands in for a
    vision/audio encoder). Stable across runs and partitionings."""
    import hashlib

    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 - 0.5 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata that's derivable JVM-side without decoding: byte length and a
    magic-number format sniff (JPEG/PNG/WAV/MP4). Predicates on these prune
    partitions before any Python worker sees payload bytes."""
    p = F.col(payload_col)
    hex4 = F.hex(F.substring(p, 1, 4))
    return df.withColumns(
        {
            "n_bytes": F.length(p).cast("long"),
            "sniffed_format": (
                F.when(hex4.startswith("FFD8"), "jpeg")
                .when(hex4 == "89504E47", "png")
                .when(hex4 == "52494646", "wav")
                .otherwise("unknown")
            ),
        }
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
    decode_stub: bool = True,
) -> DataFrame:
    """Image decode + feature extraction via mapInPandas.

    `decode_stub=False` decodes with PIL when importable (probed once per
    batch iterator, not per row): grayscale thumbnail pixels become the
    embedding (sqrt(dim)-sided, row-major, [-0.5, 0.5)) and mean_luma is
    the true full-image luma mean. Swap the thumbnail for a vision
    encoder at the same seam for model embeddings. Batch shape: Arrow
    record batches of (media_id, payload); one feature row per input row.
    """

    def batches(it: Iterator["Any"]) -> Iterator["Any"]:
        import pandas as pd

        Image = None
        if not decode_stub:
            try:
                from PIL import Image  # noqa: N813 - PIL's exported name
            except ImportError as exc:
                raise NotImplementedError(
                    "real image decode requires PIL; not importable here"
                ) from exc
            import io
            import math

            side = max(1, math.isqrt(dim - 1) + 1)  # ceil(sqrt(dim))

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if decode_stub:
                    feats = _stub_features(raw, dim)
                    luma = float(sum(feats) / len(feats) + 0.5)
                else:
                    img = Image.open(io.BytesIO(raw)).convert("L")
                    px = list(img.getdata())
                    luma = float(sum(px) / len(px) / 255.0)
                    thumb = list(img.resize((side, side)).getdata())
                    feats = [float(p / 255.0 - 0.5) for p in thumb[:dim]]
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(raw),
                        "embedding": feats,
                        "mean_luma": luma,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def dhash_from_features(
    emb_col: str = "embedding",
    width: int = 24,
):
    """Perceptual difference-hash (dHash) over an extracted feature
    vector, JVM-side: bit i set iff feature[i] > feature[i+1] (the
    classic gradient hash -- with a real decoder the features are
    row-major thumbnail pixels and the hash survives resize/re-encode;
    with the stub decoder they are sha256-derived, so only identical
    payloads and chance collisions pair).  Needs ``width + 1``
    features; returns a non-negative long (width <= 63), bit
    (width-1-i) weighted so the hash reads big-endian like the usual
    dHash hex.  Strictly monotone feature scaling cannot change the
    hash (only the > comparisons matter), which is what makes the
    DuckDB byte-compare replay exact (q313's oracle).
    """
    assert 0 < width <= 63, "dhash width must fit a non-negative long"
    terms = [
        F.when(
            F.element_at(F.col(emb_col), i)
            > F.element_at(F.col(emb_col), i + 1),
            F.lit(1 << (width - i)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(1, width + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_side: int = 256,
    decode_stub: bool = True,
) -> DataFrame:
    """Image resize via mapInPandas: payload -> resized payload.
    `decode_stub=False` uses PIL when importable: decode -> thumbnail
    (aspect-preserving, longest side <= max_side) -> re-encode PNG. The
    stub truncates bytes deterministically instead."""
    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def batches(it: Iterator["Any"]) -> Iterator["Any"]:
        import pandas as pd

        Image = None
        if not decode_stub:
            try:
                from PIL import Image  # noqa: N813 - PIL's exported name
            except ImportError as exc:
                raise NotImplementedError(
                    "real resize requires PIL; not importable here"
                ) from exc
            import io

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if decode_stub:
                    out = raw[: max_side * 64]
                else:
                    img = Image.open(io.BytesIO(raw))
                    img.thumbnail((max_side, max_side))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out = buf.getvalue()
                rows.append({"media_id": int(mid), "payload": out})
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    max_frames: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling via mapInPandas -- the one-to-many shape (N frame rows
    per video row). The stub slices the payload into chunks as fake frames."""

    def batches(it: Iterator["Any"]) -> Iterator["Any"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if not decode_stub:
                    raise NotImplementedError("real frame sampling requires ffmpeg")
                chunk = max(len(raw) // max(every_n, 1), 1)
                for i in range(min(max_frames, max(len(raw) // chunk, 1))):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_index": i * every_n,
                            "frame_payload": raw[i * chunk : (i + 1) * chunk],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("window_energy", ArrayType(DoubleType())),
    ]
)


def extract_audio_windows(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    window_bytes: int = 4096,
    max_windows: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Audio decode + fixed-window energy features via mapInPandas -- the
    audio sibling of extract_image_features / sample_video_frames (the
    three modalities share one plumbing shape: opaque bytes in, typed
    feature rows out, one Python hop per Arrow batch).

    `decode_stub=False` REALLY decodes 16-bit PCM WAV with stdlib `wave`
    (RIFF is a container around raw PCM -- no external codec needed, so
    this path runs and is golden-tested even in codec-less containers):
    per-window energy is the RMS of decoded samples normalized to [0, 1].
    Compressed formats (mp3/ogg/flac) need librosa/soundfile at the same
    seam and raise NotImplementedError when the payload is not RIFF/WAV.
    The stub treats the payload as PCM-ish raw bytes and emits
    deterministic per-window byte-mean "energy" so the window arithmetic
    (count, truncation at max_windows) is testable everywhere.
    """

    def batches(it: Iterator["Any"]) -> Iterator["Any"]:
        import pandas as pd

        if not decode_stub:
            import array
            import io
            import math
            import wave

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if decode_stub:
                    n_win = min(max_windows, max(1, -(-len(raw) // window_bytes)))
                    energy = []
                    for k in range(n_win):
                        chunk = raw[k * window_bytes : (k + 1) * window_bytes]
                        energy.append(
                            float(sum(chunk) / len(chunk)) if chunk else 0.0
                        )
                else:
                    if raw[:4] != b"RIFF":
                        raise NotImplementedError(
                            "only PCM WAV decodes without external codecs; "
                            "compressed audio needs librosa/soundfile here"
                        )
                    with wave.open(io.BytesIO(raw)) as w:
                        if w.getsampwidth() != 2:
                            raise NotImplementedError(
                                "only 16-bit PCM handled; widen at this seam"
                            )
                        pcm = array.array("h")
                        pcm.frombytes(w.readframes(w.getnframes()))
                    samples_per_win = max(1, window_bytes // 2)
                    n_win = min(
                        max_windows,
                        max(1, -(-len(pcm) // samples_per_win)),
                    )
                    energy = []
                    for k in range(n_win):
                        chunk = pcm[k * samples_per_win : (k + 1) * samples_per_win]
                        energy.append(
                            math.sqrt(sum(s * s for s in chunk) / len(chunk))
                            / 32768.0
                            if len(chunk)
                            else 0.0
                        )
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(raw),
                        "n_windows": n_win,
                        "window_energy": energy,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
