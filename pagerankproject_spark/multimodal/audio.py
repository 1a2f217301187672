"""Native PCM-WAV audio decode + Arrow-batched audio features —
extends the round-5 native-codec push (jpeg.py) to the audio column:
the training-data pipeline's audio layer no longer needs
ffmpeg/librosa for the (very common) uncompressed-WAV case.

Decoder (`decode_wav`): RIFF/WAVE chunk walk, integer PCM at 8-bit
unsigned / 16-bit / 24-bit / 32-bit signed little-endian, any channel
count and sample rate, fmt codes 1 (PCM) and 0xFFFE (EXTENSIBLE
wrapping PCM). Compressed codecs (MP3 frames, FLAC, OGG, float WAV,
ADPCM, mu-law) raise NotImplementedError naming the codec — the same
honest-stub policy as the image side.

Spark surface (`audio_features`): Arrow `mapInPandas` over the binary
column -> per-clip (sample_rate, n_channels, n_samples, duration_s,
rms, zero_crossings, peak) — the metadata + loudness + activity
signals an audio-corpus quality filter reads. All-integer where
exactness matters (zero crossings, peak, sum of squares); the two
divisions (duration, rms) happen once per clip.

Encoder (`encode_wav_pcm16`): minimal PCM16 writer for tests — real
WAV bytes round-trip through the decoder with no external tooling.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_FMT_NAMES = {
    0x0002: "MS-ADPCM",
    0x0003: "IEEE-float WAV",
    0x0006: "A-law",
    0x0007: "mu-law",
    0x0011: "IMA-ADPCM",
    0x0055: "MP3-in-WAV",
}


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode PCM WAV bytes -> (channels, sample_rate, n_samples,
    samples) with samples as interleaved signed ints (8-bit unsigned
    recentred to signed by -128); n_samples counts frames (per
    channel)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    code, channels, rate = struct.unpack("<HHI", fmt[0:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if code == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real format leads the GUID
        code = struct.unpack("<H", fmt[24:26])[0]
    if code != 1:
        name = _FMT_NAMES.get(code, f"format 0x{code:04X}")
        raise NotImplementedError(
            f"non-PCM WAV ({name}) needs ffmpeg/librosa; the native "
            "decoder covers integer PCM (8/16/24/32-bit)"
        )
    if bits == 8:
        samples = [b - 128 for b in data]
    elif bits == 16:
        cnt = len(data) // 2
        samples = list(struct.unpack(f"<{cnt}h", data[: cnt * 2]))
    elif bits == 24:
        cnt = len(data) // 3
        samples = []
        for i in range(cnt):
            v = int.from_bytes(data[3 * i : 3 * i + 3], "little")
            samples.append(v - (1 << 24) if v >= (1 << 23) else v)
    elif bits == 32:
        cnt = len(data) // 4
        samples = list(struct.unpack(f"<{cnt}i", data[: cnt * 4]))
    else:
        raise NotImplementedError(
            f"{bits}-bit PCM WAV not supported (8/16/24/32 are)"
        )
    if channels <= 0:
        raise ValueError("corrupt WAV: zero channels")
    frames = len(samples) // channels
    return channels, rate, frames, samples[: frames * channels]


def encode_wav_pcm16(
    sample_rate: int, channels: int, samples: list[int]
) -> bytes:
    """Minimal PCM16 WAV writer (tests): interleaved signed 16-bit."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(out)) + out


def synthesize_wav_table(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-WAV fixture generator for the audio contract
    key (the synthesize_png_table pattern): per document a 256-frame
    mono PCM16 clip at 8000 Hz whose samples follow the pure-integer
    rule v_i = ((doc_id*7 + i*13) % 201) - 100. The DuckDB oracle
    computes the features from this RULE directly; the engine goes
    ENCODE -> DECODE through the real WAV writer/reader, so the codec
    round-trip is inside the value-checked contract.

    Output: (url, media) with url = 'wav://<id>' and media real WAV
    bytes."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, blobs = [], []
            for did in pdf[id_col]:
                did = int(did)
                samples = [
                    ((did * 7 + i * 13) % 201) - 100 for i in range(256)
                ]
                urls.append(f"wav://{did}")
                blobs.append(encode_wav_pcm16(8000, 1, samples))
            yield pd.DataFrame({"url": urls, "media": blobs})

    return docs.select(id_col).mapInPandas(synth, schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sample_rate", T.LongType(), False),
        T.StructField("n_channels", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("peak", T.LongType(), False),
    ]
)


def audio_features(
    df: DataFrame, url_col: str = "url", bin_col: str = "media"
) -> DataFrame:
    """Per-clip audio quality/activity signals over a binary WAV
    column, Arrow-batched (the decode is inherently python; the batch
    boundary is the Arrow transfer, never a per-row UDF). Integer
    aggregates (sum of squares, sign changes on channel 0, abs peak)
    with one division each for duration and rms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[bin_col]):
                ch, rate, frames, samples = decode_wav(bytes(payload))
                sq = 0
                peak = 0
                for v in samples:
                    sq += v * v
                    a = -v if v < 0 else v
                    if a > peak:
                        peak = a
                zc = 0
                prev = 0
                for i in range(frames):
                    v = samples[i * ch]
                    if v != 0:
                        if prev and (v > 0) != (prev > 0):
                            zc += 1
                        prev = v
                rows.append(
                    (
                        url,
                        rate,
                        ch,
                        frames,
                        frames / rate if rate else 0.0,
                        math.sqrt(sq / len(samples)) if samples else 0.0,
                        zc,
                        peak,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(url_col, bin_col).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )
