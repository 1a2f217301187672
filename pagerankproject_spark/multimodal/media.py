"""Multimodal columns: image/audio/video payloads as opaque binary.

Design for 100 TB: media bytes live in a `binary` column with typed
metadata beside it; everything metadata-level (size, checksum,
container sniffing) is a JVM-side expression, and everything that
must touch the bytes (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched `mapInPandas` so each task processes
whole record batches with zero per-row Python overhead. The batch
never collects to the driver and the binary column is pruned away by
Catalyst for queries that only read metadata.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernel is STUBBED: by default it raises
``NotImplementedError`` with the dependency it needs; with
``fake=True`` it runs a deterministic fake decoder that parses the
engine's own 16-byte test header (see ``fake_media_bytes``) — the
Spark-side plumbing (schemas, UDF signatures, batch iteration,
partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes (hex) -> mime; checked longest-first.
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("494433", "audio/mpeg"),
    ("4F676753", "audio/ogg"),
    ("1A45DFA3", "video/webm"),
    ("00000018", "video/mp4"),
    ("46414B45", "application/x-fake-media"),  # 'FAKE' test header
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def fake_media_bytes(url: str, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake media payload: 16-byte header
    (b'FAKE', width, height, channels as <III>) + pseudo-pixels derived
    from md5(url). Lets tests exercise the full decode path without
    real codecs."""
    header = b"FAKE" + struct.pack("<III", width, height, channels)
    seed = hashlib.md5(url.encode()).digest()
    body = (seed * ((width * height * channels) // len(seed) + 1))[
        : width * height * channels
    ]
    return header + body


def sniff_mime_expr(bin_col: Column) -> Column:
    """Magic-byte container sniffing — pure JVM expression."""
    prefix = F.hex(F.substring(bin_col, 1, 4))
    out = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        out = F.when(prefix.startswith(magic), F.lit(mime)).otherwise(out)
    return out


def media_metadata(
    df: DataFrame, url_col: str = "url", bin_col: str = "media"
) -> DataFrame:
    """Metadata pass: never decodes, never leaves the JVM."""
    b = F.col(bin_col)
    return df.select(
        F.col(url_col).alias("url"),
        sniff_mime_expr(b).alias("mime"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha"),
    )


def _decode_fake(url: str, payload: bytes) -> tuple[int, int, int, float]:
    if payload[:4] != b"FAKE":
        raise ValueError(f"not a fake-media payload for {url}")
    w, h, c = struct.unpack("<III", payload[4:16])
    body = payload[16 : 16 + w * h * c]
    mean = sum(body) / len(body) if body else 0.0
    return w, h, c, mean


def decode_media(
    df: DataFrame, url_col: str = "url", bin_col: str = "media", fake: bool = False
) -> DataFrame:
    """Decode media payloads -> (url, width, height, n_channels,
    mean_intensity) via Arrow-batched mapInPandas.

    Real decoding requires PIL/ffmpeg (absent here): fake=False raises
    NotImplementedError AT EXECUTION (per batch), keeping the plan
    shape testable; fake=True uses the deterministic fake decoder.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decoding needs PIL/ffmpeg which are not installed; "
                    "run with fake=True for the deterministic test decoder"
                )
            rows = [
                (u, *_decode_fake(u, bytes(p)))
                for u, p in zip(pdf[url_col], pdf[bin_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["url", "width", "height", "n_channels", "mean_intensity"],
            )

    return df.select(url_col, bin_col).mapInPandas(batches, DECODED_SCHEMA)


def extract_image_features(
    df: DataFrame,
    dim: int = 8,
    url_col: str = "url",
    bin_col: str = "media",
    fake: bool = False,
) -> DataFrame:
    """Feature-extraction plumbing: payload -> fixed-dim float vector
    (deterministic md5-chain fake in lieu of a real vision model)."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image featurization needs a vision model; fake=True runs "
                    "the deterministic stand-in"
                )
            out = []
            for u, p in zip(pdf[url_col], pdf[bin_col]):
                d = hashlib.md5(bytes(p)).digest()
                vec = [(d[i % 16] - 128) / 128.0 for i in range(dim)]
                out.append((u, vec))
            yield pd.DataFrame(out, columns=["url", "features"])

    return df.select(url_col, bin_col).mapInPandas(batches, schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 2,
    url_col: str = "url",
    bin_col: str = "media",
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame (row
    explosion inside mapInPandas — the batch shape real ffmpeg sampling
    would have). Fake: 'frames' are fixed-size slices of the payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video frame sampling needs ffmpeg; fake=True runs the "
                    "deterministic stand-in"
                )
            rows = []
            for u, p in zip(pdf[url_col], pdf[bin_col]):
                payload = bytes(p)[16:]
                chunks = [payload[i : i + 64] for i in range(0, len(payload), 64)]
                for idx in range(0, len(chunks), every_n):
                    rows.append(
                        (u, idx, hashlib.sha256(chunks[idx]).hexdigest()[:16])
                    )
            yield pd.DataFrame(rows, columns=["url", "frame_idx", "frame_sha"])

    return df.select(url_col, bin_col).mapInPandas(batches, FRAME_SCHEMA)
