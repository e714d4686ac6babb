"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` operators so each task processes whole record
batches without per-row Python overhead on the Spark side.

Decode paths:
- ``decode="real"`` — genuine decoding for the container-friendly formats
  implemented here in pure numpy: **PPM (P6)** images and **WAV (RIFF
  PCM16)** audio. JPEG/PNG/etc decode+resize through **Pillow when it is
  importable** and MP4/etc frame extraction through the **ffmpeg binary when
  it is on PATH** (both import-guarded: :func:`_pil` / :func:`_ffmpeg`);
  when the dependency is truly absent those payloads raise
  ``NotImplementedError`` at the exact spot the codec call belongs.
- ``decode="fake"`` — deterministic shape-correct stand-in derived from the
  payload hash (useful when payloads are arbitrary test bytes).

``synthesize_media(real_formats=True)`` emits real PPM/WAV payloads so the
whole pipeline — synthesis → decode → features/resize — runs honestly
end-to-end in this container.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)

WAV_RATE = 8000

# codecs the pure-numpy paths handle without any optional dependency
_NUMPY_CODECS = {"ppm", "wav", "fake/v1", "raw/v0"}


def _pil():
    """Pillow's Image module if importable, else None (optional dependency —
    not in the base container; JPEG/PNG paths activate when present)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _ffmpeg() -> str | None:
    """Path to an ffmpeg binary if one is on PATH, else None."""
    import shutil

    return shutil.which("ffmpeg")


def _pil_decode(payload: bytes) -> np.ndarray:
    """Any PIL-supported still-image payload → (h, w, 3) uint8."""
    import io

    img = _pil().open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _ffmpeg_frame(payload: bytes, ts_ms: int) -> bytes:
    """Demux ONE frame at ``ts_ms`` from a video container via the ffmpeg
    binary (stdin → single-image PPM on stdout, no temp files)."""
    import subprocess

    proc = subprocess.run(
        [
            _ffmpeg(), "-v", "error", "-ss", f"{ts_ms / 1000:.3f}", "-i", "pipe:0",
            "-frames:v", "1", "-pix_fmt", "rgb24",
            "-f", "image2", "-vcodec", "ppm", "pipe:1",
        ],
        input=payload,
        capture_output=True,
        check=True,
    )
    if not proc.stdout:
        # ffmpeg exits 0 with empty stdout when -ss lands past EOF
        raise ValueError(f"ffmpeg produced no frame at {ts_ms} ms")
    return proc.stdout


def _split_ppm_stream(buf: bytes) -> list[bytes]:
    """Split an image2pipe PPM stream into individual P6 payloads by walking
    header + pixel-block lengths (pixel data may itself contain b'P6', so a
    delimiter split would corrupt frames)."""
    frames, pos = [], 0
    while pos < len(buf):
        if buf[pos : pos + 2] != b"P6":
            raise ValueError(f"PPM stream desync at byte {pos}")
        # header fits well inside 64 bytes; never re-split the whole tail
        parts = buf[pos : pos + 64].split(b"\n", 3)
        if len(parts) < 4:
            raise ValueError("truncated PPM stream header")
        w, h = (int(x) for x in parts[1].split())
        maxval = int(parts[2])
        if maxval > 255:
            # 2-byte-per-sample PPM (e.g. >8-bit source without -pix_fmt
            # rgb24 pinned) — walking it at 3 bytes/pixel would desync
            raise ValueError(
                f"PPM maxval {maxval} > 255 (16-bit samples) unsupported; "
                "pin -pix_fmt rgb24 on the producing ffmpeg command"
            )
        hdr_len = len(parts[0]) + len(parts[1]) + len(parts[2]) + 3
        total = hdr_len + w * h * 3
        if pos + total > len(buf):
            raise ValueError("truncated PPM stream pixel data")
        frames.append(buf[pos : pos + total])
        pos += total
    return frames


def _ffmpeg_frames(payload: bytes, every_ms: int, max_frames: int) -> list[bytes]:
    """Demux up to ``max_frames`` PPM frames at a ``every_ms`` cadence in ONE
    ffmpeg invocation (fps filter + image2pipe), instead of re-piping the
    whole payload once per frame (ADVICE r3: O(frames × payload) I/O).
    Raises when ffmpeg returns no frames for a non-empty payload."""
    import subprocess

    proc = subprocess.run(
        [
            _ffmpeg(), "-v", "error", "-i", "pipe:0",
            "-vf", f"fps=1000/{int(every_ms)}",
            "-frames:v", str(int(max_frames)), "-pix_fmt", "rgb24",
            "-f", "image2pipe", "-vcodec", "ppm", "pipe:1",
        ],
        input=payload,
        capture_output=True,
        check=True,
    )
    frames = _split_ppm_stream(proc.stdout)
    if not frames and payload:
        raise ValueError(
            "ffmpeg produced no frames for a non-empty video payload"
        )
    return frames


# ---------------------------------------------------------------------------
# pure-numpy codecs (no PIL / ffmpeg)
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = pixels.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """binary PPM (P6) → (h, w, 3) uint8. Raises ValueError on corruption."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raw = parts[3]
    need = w * h * 3
    if len(raw) < need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (int16 samples flattened across channels, rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, samples = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, _ch, rate, _bps, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------

def synthesize_media(
    spark, n: int = 64, seed: int = 42, real_formats: bool = False
) -> DataFrame:
    """Deterministic media table for tests.

    ``real_formats=False``: payload = sha-chain bytes (codec 'fake/v1').
    ``real_formats=True``: images are real PPM (P6) gradients+noise, audio
    is a real WAV sine+noise, video keeps an opaque payload (codec 'raw/v0')
    — all pure functions of (media_id, seed)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        (F.pmod("id", F.lit(4)) * 64 + 64).cast("int").alias("width"),
        (F.pmod("id", F.lit(3)) * 64 + 64).cast("int").alias("height"),
        (F.pmod("id", F.lit(7)) * 1000 + 500).cast("int").alias("duration_ms"),
    )
    if not real_formats:
        return base.withColumn(
            "payload",
            F.to_binary(
                F.sha2(F.concat_ws(":", F.col("media_id"), F.lit(str(seed))), 256),
                F.lit("hex"),
            ),
        ).withColumn("codec", F.lit("fake/v1"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, codecs = [], []
            for mid, kind, w, h, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["width"], pdf["height"],
                pdf["duration_ms"],
            ):
                rng = np.random.default_rng((seed << 20) ^ int(mid))
                if kind == "image":
                    w, h = int(w), int(h)
                    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
                    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None, None]
                    noise = rng.integers(0, 32, size=(h, w, 3))
                    px = np.clip((gx + gy) / 2 + noise, 0, 255).astype(np.uint8)
                    payloads.append(encode_ppm(px))
                    codecs.append("ppm")
                elif kind == "audio":
                    dur_s = int(dur) / 1000.0
                    t = np.arange(int(WAV_RATE * dur_s)) / WAV_RATE
                    freq = 110.0 * (1 + int(mid) % 8)
                    wave = 0.6 * np.sin(2 * np.pi * freq * t)
                    wave += 0.05 * rng.standard_normal(len(t))
                    payloads.append(
                        encode_wav((np.clip(wave, -1, 1) * 32767).astype(np.int16))
                    )
                    codecs.append("wav")
                else:
                    payloads.append(rng.bytes(256))
                    codecs.append("raw/v0")
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["codec"] = codecs
            yield pdf

    gen_schema = (
        "media_id long, kind string, width int, height int, duration_ms int, "
        "payload binary, codec string"
    )
    return base.mapInPandas(gen, schema=gen_schema).select(
        "media_id", "kind", "payload", "width", "height", "duration_ms", "codec"
    )


# ---------------------------------------------------------------------------
# feature extraction / resize / frame sampling
# ---------------------------------------------------------------------------

def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: expand the payload hash into a
    float vector in [0,1). Hashes the payload's lowercase-hex STRING (not
    the raw bytes) — equally arbitrary for a stand-in, and replayable by
    SQL oracles whose sha256 only accepts VARCHAR:
    ``sha256(lower(hex(payload)))`` in DuckDB."""
    h = hashlib.sha256((payload or b"").hex().encode()).digest()
    reps = (out_dim * 4) // len(h) + 1
    buf = (h * reps)[: out_dim * 4]
    arr = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
    return arr / np.float64(2**32)


def _image_features(px: np.ndarray, out_dim: int) -> np.ndarray:
    """Channel means/stds + a coarse luminance grid, padded/truncated to
    out_dim; all values scaled to [0,1]."""
    feats = [px.mean(axis=(0, 1)) / 255.0, px.std(axis=(0, 1)) / 128.0]
    lum = px.astype(np.float64).mean(axis=2)
    g = max(1, int(np.sqrt(max(out_dim - 6, 1))))
    h, w = lum.shape
    grid = lum[: h - h % g or h, : w - w % g or w]
    gh, gw = grid.shape
    grid = grid.reshape(g, gh // g, g, gw // g).mean(axis=(1, 3)) / 255.0
    vec = np.concatenate([np.concatenate(feats), grid.ravel()])
    if len(vec) < out_dim:
        vec = np.pad(vec, (0, out_dim - len(vec)))
    return vec[:out_dim]


def _audio_features(samples: np.ndarray, out_dim: int) -> np.ndarray:
    """Windowed RMS energy resampled to out_dim, in [0,1]."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) == 0:
        return np.zeros(out_dim)
    win = max(1, len(x) // out_dim)
    usable = x[: (len(x) // win) * win]
    rms = np.sqrt((usable.reshape(-1, win) ** 2).mean(axis=1))
    if len(rms) < out_dim:
        rms = np.pad(rms, (0, out_dim - len(rms)))
    return rms[:out_dim]


def _decode_features(payload: bytes, codec: str, kind: str, out_dim: int, decode: str) -> np.ndarray:
    payload = bytes(payload)
    if decode == "fake":
        return _fake_decode(payload, out_dim)
    if codec == "ppm":
        return _image_features(decode_ppm(payload), out_dim)
    if codec == "wav":
        return _audio_features(decode_wav(payload)[0], out_dim)
    if codec in ("fake/v1", "raw/v0"):
        # honest fallback for payloads that are not a real format
        return _fake_decode(payload, out_dim)
    if kind == "image":
        if _pil() is not None:
            return _image_features(_pil_decode(payload), out_dim)
        raise NotImplementedError(
            f"image codec {codec!r} requires Pillow — not installed in this "
            "environment"
        )
    if kind == "video":
        if _ffmpeg() is not None:
            return _image_features(decode_ppm(_ffmpeg_frame(payload, 0)), out_dim)
        raise NotImplementedError(
            f"video codec {codec!r} requires an ffmpeg binary on PATH — not "
            "installed in this environment"
        )
    # e.g. an audio row with codec 'mp3': no decode path exists for the
    # kind/codec combination at all — say so instead of blaming a dependency
    # that may well be installed (ADVICE r3)
    raise NotImplementedError(
        f"no decode path for kind={kind!r} codec={codec!r} (built-in: ppm, "
        "wav, fake/v1, raw/v0; other image codecs via Pillow, video via "
        "ffmpeg)"
    )


def extract_features(
    df: DataFrame, out_dim: int = 16, decode: str = "real"
) -> DataFrame:
    """Append ``features array<double>`` per media row via mapInPandas.

    ``decode="real"`` decodes PPM/WAV payloads with the pure-numpy codecs
    above (other formats go through Pillow/ffmpeg when present, else raise
    NotImplementedError); ``decode="fake"`` uses the hash stand-in
    regardless of codec."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", features array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                _decode_features(p, c, k, out_dim, decode).tolist()
                for p, c, k in zip(pdf["payload"], pdf["codec"], pdf["kind"])
            ]
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def sample_frames(
    df: DataFrame, every_ms: int = 250, max_frames: int = 16, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Frame *timing* (index/timestamp cadence from duration_ms) is real;
    frame *pixel extraction* needs a container demuxer, so ``decode="real"``
    demuxes PPM frames through the ffmpeg binary when one is on PATH and
    raises NotImplementedError when not; ``decode="fake"`` emits
    deterministic payload-hash frames. Output: ``(media_id long,
    frame_idx int, frame_ts_ms int, frame binary)``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real" and _ffmpeg() is None:
                raise NotImplementedError(
                    "frame extraction requires an ffmpeg binary on PATH — "
                    "not installed in this environment"
                )
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, kind, dur, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["duration_ms"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                n = min(max_frames, max(1, int(dur) // every_ms))
                if decode == "real":
                    # one ffmpeg invocation per video (ADVICE r3); may
                    # return < n frames when the stream is shorter than
                    # duration_ms claims — emit what actually decoded
                    frames = _ffmpeg_frames(bytes(payload), every_ms, n)[:n]
                else:
                    frames = [
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "big")).digest()
                        for i in range(n)
                    ]
                for i, frame in enumerate(frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        op, schema="media_id long, frame_idx int, frame_ts_ms int, frame binary"
    )


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, decode: str = "real"
) -> DataFrame:
    """Image resize. ``decode="real"`` decodes PPM payloads, nearest-
    neighbour-resamples the pixels in numpy, and re-encodes PPM (payload AND
    metadata change); non-PPM codecs decode through Pillow when it is
    importable (re-encoded as PPM — lossless, no encoder settings to pin)
    and raise NotImplementedError when not. ``decode="fake"`` only rewrites
    metadata (plumbing test mode)."""

    def _resample(px: np.ndarray) -> bytes:
        ys = (np.arange(height) * px.shape[0] // height).clip(0, px.shape[0] - 1)
        xs = (np.arange(width) * px.shape[1] // width).clip(0, px.shape[1] - 1)
        return encode_ppm(px[ys][:, xs])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            new_payloads, new_codecs = [], []
            for kind, codec, payload in zip(pdf["kind"], pdf["codec"], pdf["payload"]):
                if kind != "image" or decode == "fake":
                    new_payloads.append(bytes(payload))
                    new_codecs.append(codec)
                elif codec == "ppm":
                    new_payloads.append(_resample(decode_ppm(bytes(payload))))
                    new_codecs.append("ppm")
                elif _pil() is not None:
                    new_payloads.append(_resample(_pil_decode(bytes(payload))))
                    new_codecs.append("ppm")  # re-encoded losslessly as PPM
                else:
                    raise NotImplementedError(
                        f"resize of codec {codec!r} requires Pillow — "
                        "not installed in this environment"
                    )
            pdf["payload"] = new_payloads
            pdf["codec"] = new_codecs
            is_img = pdf["kind"] == "image"
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(op, schema=schema)
