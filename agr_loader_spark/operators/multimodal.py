"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; all
Spark-side plumbing (schema, partitioning, Arrow batch shape) is real
and tested. Codec status per kind:

- audio/WAV: a REAL pure-python RIFF/WAVE PCM parser (`decode_wav`) —
  no codec lib needed — feeding real per-window RMS features.
- image/video: STUBBED (no media libs in this container):
  ``decode_stub='fake'`` produces a deterministic fake feature vector
  from the bytes; ``decode_stub='raise'`` raises NotImplementedError
  where a real decoder (PIL/ffmpeg) would plug in.

The mapInPandas iterator shape — consume a batch, emit a transformed
batch, never materialize the partition — is the production contract for
100 TB of media.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def make_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal 16-bit mono PCM RIFF/WAVE writer (pure python): float
    samples in [-1, 1] -> a complete, valid .wav byte payload."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Minimal RIFF/WAVE PCM parser — pure python + numpy, no codec lib:
    returns (sample_rate, n_channels, float32 samples in [-1, 1],
    channel-interleaved). Supports uncompressed PCM 8/16-bit; anything
    else raises (that is the honest plug-point for a real audio lib)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1:
        raise ValueError(f"compressed WAV (format tag {audio_fmt}) needs a codec lib")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM needs a codec lib")
    return rate, n_ch, x


def fake_media_payload(media_id: str, size: int) -> bytes:
    """Deterministic opaque payload for the stubbed image/video kinds: an
    md5 chain over (media_id, block index), truncated to ``size``. md5 is
    the one hash available identically in python, Spark, and DuckDB, so
    a SQL oracle can recompute these bytes exactly (same trick as the
    lsh_topk oracle's md5-Rademacher planes)."""
    import hashlib

    out = bytearray()
    j = 0
    while len(out) < size:
        out += hashlib.md5(f"{media_id}:{j}".encode()).digest()
        j += 1
    return bytes(out[:size])


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. Audio rows carry REAL (tiny) WAV
    payloads — deterministic sine bursts — so the WAV decode path runs
    end-to-end; image/video payloads are md5-chain bytes (deterministic
    AND SQL-recomputable, so the contract oracle can verify feature
    values end-to-end). Only the meta struct (not part of any contract
    output) keeps the seeded rng."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng([seed, int(i)])
                kind = kinds[int(i) % 3]
                media_id = f"media:{int(i):06d}"
                if kind == "audio":
                    freq = 100.0 + float(int(i) % 40) * 55.0
                    t = np.arange(400) / 8000.0
                    payload = make_wav(0.8 * np.sin(2 * np.pi * freq * t))
                    mime = "audio/wav"
                else:
                    size = 64 + (int(i) * 37) % 1984
                    payload = fake_media_payload(media_id, size)
                    mime = "application/octet-stream"
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "mime": mime,
                            "width": int(rng.integers(16, 512)),
                            "height": int(rng.integers(16, 512)),
                            "duration_ms": int(rng.integers(0, 60000)),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def wav_rms_features(payload: bytes, dim: int) -> np.ndarray:
    """REAL audio features from a WAV payload: decode PCM with the pure
    -python parser, split into ``dim`` equal windows, per-window RMS
    energy, L2-normalized — deterministic, codec-free, and an actual
    function of the audio signal (a different tone yields a different
    vector)."""
    _, _, x = decode_wav(payload)
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    # pad to a multiple of dim, then window-RMS via reshape
    k = -(-len(x) // dim)
    padded = np.zeros(k * dim, dtype=np.float64)
    padded[: len(x)] = x
    rms = np.sqrt((padded.reshape(dim, k) ** 2).mean(axis=1))
    norm = np.linalg.norm(rms)
    return (rms / norm if norm > 0 else rms).astype(np.float32)


def extract_features(
    media: DataFrame, feat_dim: int = 8, decode_stub: str = "fake"
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    WAV audio payloads (RIFF magic) get REAL decoded features
    (`wav_rms_features`); other kinds use `_fake_decode` until a real
    image/video codec is plugged in. The batch iterator contract,
    output schema, and partitioning are what this operator owns.
    """

    def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
        # deterministic "embedding": bucketed byte histogram, L2-normalized
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
        norm = np.linalg.norm(hist)
        return (hist / norm if norm > 0 else hist).astype(np.float32)

    def _decode(payload: bytes, dim: int) -> np.ndarray:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return wav_rms_features(payload, dim)
        return _fake_decode(payload, dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "image/video decode requires a codec library; "
                    "plug PIL/ffmpeg here (WAV audio decodes natively)"
                )
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(len).astype("int32"),
                    "features": b["payload"].map(lambda p: _decode(p, feat_dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_for_decode(media: DataFrame, target_partitions: int) -> DataFrame:
    """Media decode is CPU-bound with wildly variable payload sizes —
    repartition by a hash of the id (not by file layout) so decode tasks
    balance; at cluster scale pair with
    spark.sql.files.maxPartitionBytes to keep Arrow batches bounded."""
    return media.repartition(target_partitions, F.xxhash64("media_id"))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, decode_stub: str = "fake"
) -> DataFrame:
    """Frame sampling for video payloads: each media row fans out into
    <= n_frames (frame_idx, frame_ts_ms, frame bytes) rows, evenly
    spaced across duration_ms. The fan-out happens INSIDE the Arrow
    batch iterator (one input batch -> one larger output batch), never
    by exploding a materialized frame array through the JVM — for real
    video the frames are decoded on demand and the payload crosses the
    worker boundary once. The decode is stubbed (deterministic byte
    slices standing in for decoded frames); `decode_stub='raise'` marks
    the ffmpeg plug-point. Non-video rows pass through as a single
    frame_idx=0 row (an image IS its only frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "frame decode requires ffmpeg/pyav; plug the codec here"
                )
            is_video = (b["kind"] == "video").to_numpy()
            # non-video passthrough is pure column ops (an image IS its
            # only frame) — no per-row Python
            passthru = b.loc[~is_video]
            frames = [pd.DataFrame({
                "media_id": passthru["media_id"],
                "frame_idx": np.zeros(len(passthru), dtype=np.int32),
                "frame_ts_ms": np.zeros(len(passthru), dtype=np.int32),
                "frame": passthru["payload"],
            })]
            # all slicing ARITHMETIC is numpy (offsets, frame counts,
            # timestamps, fan-out indices); only the byte slice itself
            # touches each payload — which a real codec would anyway
            vids = b.loc[is_video]
            if len(vids):
                plens = vids["payload"].map(len).to_numpy(dtype=np.int64)
                durs = np.array(
                    [int(m["duration_ms"] or 0) for m in vids["meta"]],
                    dtype=np.int64,
                )
                ks = np.maximum(1, np.minimum(n_frames, plens))
                steps = plens // ks
                row_idx = np.repeat(np.arange(len(vids)), ks)
                j = np.arange(int(ks.sum()), dtype=np.int64) - np.repeat(
                    np.cumsum(ks) - ks, ks
                )
                starts = j * steps[row_idx]
                ends = starts + steps[row_idx]
                ts = (durs[row_idx] * j) // ks[row_idx]
                payloads = vids["payload"].to_numpy()
                frames.append(pd.DataFrame({
                    "media_id": vids["media_id"].to_numpy()[row_idx],
                    "frame_idx": j.astype(np.int32),
                    "frame_ts_ms": ts.astype(np.int32),
                    "frame": [
                        payloads[r][s:e]
                        for r, s, e in zip(row_idx, starts, ends)
                    ],
                }))
            yield pd.concat(frames, ignore_index=True)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
