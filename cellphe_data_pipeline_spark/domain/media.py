"""Audio/video multimodal columns (engine extension — the brief's
image/audio/video-as-binary pattern; images live in domain/images.py).

Same architecture as images: payloads are opaque ``binary`` columns with
typed metadata, Spark partitions/moves the bytes, Arrow batches them
into narrow per-batch kernels, and the codec sits behind ONE function
(`decode_audio`) — a deterministic fake PCM container decodes (real
audio codecs are absent from this container; swap in soundfile/ffmpeg
in production, nothing else changes).

Operators:
- ``sample_windows`` (the audio analogue of S3/S4 frame split): 1 clip →
  N fixed-length windows with sample offsets — the training-data
  "frame-sample" op. mapInPandas UDTF shape; memory bounded by
  clip × batch rows (Arrow batch cap in session.py).
- ``window_features``: per-window RMS/peak/zero-crossings — the audio
  quality-gate features (silence/clipping detection for corpus
  filtering). Pure numpy on the decoded window.
- Video: a video IS the multi-page container images.py already splits
  (S3/S4 + M-kernels); no separate code path needed.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_MAGIC = b"FAKA1"

WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("window_index", T.IntegerType()),
        T.StructField("sample_start", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("samples", T.BinaryType()),  # int16 PCM, little-endian
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("window_index", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def make_fake_audio(seed: int, n_samples: int = 16000, sample_rate: int = 16000) -> bytes:
    """Deterministic fake clip: FAKA1 | rate | n | zlib(int16 samples)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples, dtype="float64")
    wave = 0.5 * np.sin(2 * np.pi * 440.0 * t / sample_rate) + 0.1 * rng.randn(n_samples)
    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
    header = AUDIO_MAGIC + np.array([sample_rate, n_samples], dtype="<u4").tobytes()
    return header + zlib.compress(pcm.tobytes())


def decode_audio(content: bytes) -> tuple[int, np.ndarray]:
    """Codec boundary: (sample_rate, int16 samples). Only the FAKA1
    container decodes here; real formats need soundfile/ffmpeg."""
    if content[:5] == AUDIO_MAGIC:
        rate, n = np.frombuffer(content[5:13], dtype="<u4")
        pcm = np.frombuffer(zlib.decompress(content[13:]), dtype="<i2")[: int(n)]
        return int(rate), pcm
    raise NotImplementedError(
        "real audio codecs are not available in this container; replace "
        "decode_audio with a soundfile/ffmpeg-backed codec"
    )


def sample_windows(
    clips: DataFrame, window_samples: int = 4000, hop_samples: int = 2000
) -> DataFrame:
    """1 clip → N overlapping windows (the audio frame-sample op).
    Tail windows shorter than `window_samples` are kept (never silently
    dropped — the same no-silent-caps rule as text chunking)."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                rate, pcm = decode_audio(bytes(row["content"]))
                starts = list(range(0, max(len(pcm) - window_samples, 0) + hop_samples, hop_samples))
                starts = [s for s in starts if s < len(pcm)]
                yield pd.DataFrame(
                    {
                        "path": row["path"],
                        "window_index": range(len(starts)),
                        "sample_start": [int(s) for s in starts],
                        "sample_rate": rate,
                        "samples": [
                            pcm[s : s + window_samples].tobytes() for s in starts
                        ],
                    }
                )

    return clips.select("path", "content").mapInPandas(split, WINDOW_SCHEMA)


def window_features(windows: DataFrame) -> DataFrame:
    """Per-window audio features for corpus quality gates: RMS (silence),
    peak (clipping), zero-crossing count (noisiness proxy)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                x = np.frombuffer(row["samples"], dtype="<i2").astype("float64") / 32768.0
                rows.append(
                    {
                        "path": row["path"],
                        "window_index": int(row["window_index"]),
                        "rms": float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                        "peak": float(np.abs(x).max()) if len(x) else 0.0,
                        "zero_crossings": int((np.diff(np.signbit(x)) != 0).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return windows.mapInPandas(feats, FEATURES_SCHEMA)
