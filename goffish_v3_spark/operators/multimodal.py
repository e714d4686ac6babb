"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` operators so each task processes whole record
batches without per-row Python overhead.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBBED: ``decode="fake"`` produces a deterministic fake
decode (shape-correct numpy output derived from the payload hash) and
``decode="real"`` raises ``NotImplementedError`` at the exact spot a codec
call belongs. Everything Spark-side — schema, batch iteration, partitioning,
output contract — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload = sha-chain bytes."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.to_binary(
            F.sha2(F.concat_ws(":", F.col("id"), F.lit(str(seed))), 256), F.lit("hex")
        ).alias("payload"),
        (F.pmod("id", F.lit(4)) * 64 + 64).cast("int").alias("width"),
        (F.pmod("id", F.lit(3)) * 64 + 64).cast("int").alias("height"),
        (F.pmod("id", F.lit(7)) * 1000 + 500).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return df


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: expand the payload hash into a
    float vector in [0,1). Replace with a real decoder on a cluster image."""
    h = hashlib.sha256(payload or b"").digest()
    reps = (out_dim * 4) // len(h) + 1
    buf = (h * reps)[: out_dim * 4]
    arr = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
    return arr / np.float64(2**32)


def extract_features(
    df: DataFrame, out_dim: int = 16, decode: str = "fake"
) -> DataFrame:
    """Append ``features array<double>`` per media row via mapInPandas.

    ``decode="real"`` marks where PIL/ffmpeg decoding belongs — raises
    NotImplementedError in this container.
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", features array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this container"
                )
            pdf = pdf.copy()
            pdf["features"] = [
                _fake_decode(p, out_dim).tolist() for p in pdf["payload"]
            ]
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def sample_frames(
    df: DataFrame, every_ms: int = 250, max_frames: int = 16, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame with a
    deterministic fake frame payload (``decode="real"`` = ffmpeg hook).

    Output: ``(media_id long, frame_idx int, frame_ts_ms int,
    frame binary)``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("ffmpeg frame extraction not available here")
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                n = min(max_frames, max(1, int(r["duration_ms"]) // every_ms))
                for i in range(n):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(
                        hashlib.sha256(bytes(r["payload"]) + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        op, schema="media_id long, frame_idx int, frame_ts_ms int, frame binary"
    )


def resize_images(df: DataFrame, width: int = 64, height: int = 64, decode: str = "fake") -> DataFrame:
    """Image resize plumbing: passes payloads through the batch pipeline and
    rewrites metadata; the pixel work is the stubbed codec step."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("PIL resize not available in this container")
            pdf = pdf.copy()
            is_img = pdf["kind"] == "image"
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(op, schema=schema)
