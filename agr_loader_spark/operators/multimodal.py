"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; all
Spark-side plumbing (schema, partitioning, Arrow batch shape) is real
and tested. The actual codec step is STUBBED (no image/audio libs in
this container): ``decode_stub='fake'`` produces a deterministic fake
feature vector from the bytes; ``decode_stub='raise'`` raises
NotImplementedError where a real decoder (PIL/torchaudio/ffmpeg) would
plug in. The mapInPandas iterator shape — consume a batch, emit a
transformed batch, never materialize the partition — is the production
contract for 100 TB of media.
"""

from __future__ import annotations

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


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng([seed, int(i)])
                size = int(rng.integers(64, 2048))
                rows.append(
                    {
                        "media_id": f"media:{i:06d}",
                        "kind": kinds[int(i) % 3],
                        "payload": rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
                        "meta": {
                            "mime": "application/octet-stream",
                            "width": int(rng.integers(16, 512)),
                            "height": int(rng.integers(16, 512)),
                            "duration_ms": int(rng.integers(0, 60000)),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, feat_dim: int = 8, decode_stub: str = "fake"
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real deployments replace `_fake_decode` with the codec call; the
    batch iterator contract, output schema, and partitioning are what
    this operator actually owns.
    """

    def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
        # deterministic "embedding": bucketed byte histogram, L2-normalized
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
        norm = np.linalg.norm(hist)
        return (hist / norm if norm > 0 else hist).astype(np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires an image/audio codec library; "
                    "plug PIL/torchaudio here"
                )
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(len).astype("int32"),
                    "features": b["payload"].map(lambda p: _fake_decode(p, feat_dim)),
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
            # per-payload frame slicing is inherently per-row (the codec
            # consumes one payload at a time)
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for _, row in b.loc[is_video].iterrows():
                payload = row["payload"]
                dur = int(row["meta"]["duration_ms"] or 0)
                k = max(1, min(n_frames, len(payload)))
                step = len(payload) // k
                for j in range(k):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(j)
                    out["frame_ts_ms"].append((dur * j) // k)
                    out["frame"].append(payload[j * step:(j + 1) * step])
            frames.append(pd.DataFrame(out))
            yield pd.concat(frames, ignore_index=True)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
