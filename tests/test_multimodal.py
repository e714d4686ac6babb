"""Multimodal: real pure-numpy PPM/WAV decode paths + batch plumbing +
deterministic fake fallback; PIL/ffmpeg-needing codecs stay loudly gated."""

import numpy as np
import pytest

from goffish_v3_spark.operators.multimodal import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


def test_ppm_roundtrip():
    px = (np.arange(4 * 6 * 3) % 256).astype(np.uint8).reshape(4, 6, 3)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_wav_roundtrip():
    s = (np.sin(np.arange(800) / 10) * 20000).astype(np.int16)
    out, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_extract_features_fake_payloads(spark):
    media = synthesize_media(spark, n=30)
    out = extract_features(media, out_dim=16).collect()
    assert len(out) == 30
    assert all(len(r.features) == 16 for r in out)
    again = {r.media_id: r.features for r in extract_features(media, out_dim=16).collect()}
    assert all(again[r.media_id] == r.features for r in out)


def test_extract_features_real_formats(spark):
    """Images/audio carry genuine PPM/WAV payloads; the real decode path
    parses them (not a hash stand-in) and is deterministic."""
    media = synthesize_media(spark, n=12, seed=5, real_formats=True)
    rows = {r.media_id: r for r in media.collect()}
    # payloads really are the formats they claim
    img = next(r for r in rows.values() if r.kind == "image")
    assert bytes(img.payload).startswith(b"P6")
    assert decode_ppm(bytes(img.payload)).shape == (img.height, img.width, 3)
    aud = next(r for r in rows.values() if r.kind == "audio")
    assert bytes(aud.payload)[:4] == b"RIFF"

    out = {r.media_id: r.features for r in extract_features(media, out_dim=16, decode="real").collect()}
    assert all(len(v) == 16 for v in out.values())
    # real image features reflect pixel stats: distinct from the hash fake
    fake = {r.media_id: r.features for r in extract_features(media, out_dim=16, decode="fake").collect()}
    assert out[img.media_id] != fake[img.media_id]
    again = {r.media_id: r.features for r in extract_features(media, out_dim=16, decode="real").collect()}
    assert again == out


def _jpegish_df(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [1],
            "kind": ["image"],
            "payload": [b"\xff\xd8\xff\xe0 jpeg-ish"],
            "width": [8],
            "height": [8],
            "duration_ms": [0],
            "codec": ["jpeg"],
        }
    )
    return spark.createDataFrame(pdf)


def test_real_decode_unknown_codec_raises_without_pillow(spark):
    """The NotImplementedError gate only fires when Pillow is truly absent
    (with Pillow present the payload goes to the real decoder instead)."""
    from goffish_v3_spark.operators.multimodal import _pil

    if _pil() is not None:
        pytest.skip("Pillow installed — the guarded path decodes for real")
    with pytest.raises(Exception) as exc:
        extract_features(_jpegish_df(spark), decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or "Pillow" in str(exc.value)


def test_pillow_decode_and_resize_when_available(spark):
    """Dep-gated: with Pillow importable, JPEG/PNG payloads really decode
    (features + resize), no NotImplementedError."""
    from goffish_v3_spark.operators.multimodal import _pil

    Image = _pil()
    if Image is None:
        pytest.skip("Pillow not installed in this environment")
    import io

    import numpy as np
    import pandas as pd

    px = (np.arange(16 * 16 * 3) % 256).astype(np.uint8).reshape(16, 16, 3)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    pdf = pd.DataFrame(
        {
            "media_id": [7],
            "kind": ["image"],
            "payload": [buf.getvalue()],
            "width": [16],
            "height": [16],
            "duration_ms": [0],
            "codec": ["png"],
        }
    )
    df = spark.createDataFrame(pdf)
    feats = extract_features(df, out_dim=16, decode="real").collect()[0].features
    assert len(feats) == 16
    out = resize_images(df, width=8, height=8, decode="real").collect()[0]
    assert out.codec == "ppm"
    assert decode_ppm(bytes(out.payload)).shape == (8, 8, 3)


def test_ffmpeg_frame_extraction_when_available(spark):
    """Dep-gated: with an ffmpeg binary on PATH, decode='real' frame
    sampling demuxes genuine PPM frames."""
    from goffish_v3_spark.operators.multimodal import _ffmpeg, _ffmpeg_frame

    if _ffmpeg() is None:
        pytest.skip("ffmpeg not installed in this environment")
    import subprocess

    # build a tiny real mp4 with ffmpeg itself (deterministic testsrc)
    proc = subprocess.run(
        [_ffmpeg(), "-v", "error", "-f", "lavfi", "-i", "testsrc=duration=1:size=64x64:rate=4",
         "-f", "mp4", "-movflags", "frag_keyframe+empty_moov", "pipe:1"],
        capture_output=True, check=True,
    )
    frame = _ffmpeg_frame(proc.stdout, 250)
    assert frame.startswith(b"P6")
    assert decode_ppm(frame).shape == (64, 64, 3)


def test_sample_frames_real_raises_without_ffmpeg(spark):
    from goffish_v3_spark.operators.multimodal import _ffmpeg

    if _ffmpeg() is not None:
        pytest.skip("ffmpeg installed — the guarded path extracts for real")
    media = synthesize_media(spark, n=6)
    with pytest.raises(Exception) as exc:
        sample_frames(media, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or "ffmpeg" in str(exc.value)


def test_sample_frames_only_videos(spark):
    media = synthesize_media(spark, n=30)
    frames = sample_frames(media, every_ms=250, max_frames=4).collect()
    video_ids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in frames} <= video_ids
    assert all(r.frame_ts_ms == r.frame_idx * 250 for r in frames)
    assert all(len(r.frame) == 32 for r in frames)


def test_resize_real_ppm_payloads(spark):
    media = synthesize_media(spark, n=12, seed=9, real_formats=True)
    out = resize_images(media, width=32, height=32, decode="real").collect()
    for r in out:
        if r.kind == "image":
            assert (r.width, r.height) == (32, 32)
            assert decode_ppm(bytes(r.payload)).shape == (32, 32, 3)


def test_resize_fake_mode_rewrites_metadata_only(spark):
    media = synthesize_media(spark, n=30)
    out = resize_images(media, width=32, height=32, decode="fake").collect()
    for r in out:
        if r.kind == "image":
            assert (r.width, r.height) == (32, 32)


def test_split_ppm_stream_roundtrip():
    """image2pipe stream splitting walks header+pixel lengths — pixel bytes
    that happen to contain b'P6' must not desync the parse."""
    import numpy as np
    import pytest

    from goffish_v3_spark.operators.multimodal import (
        _split_ppm_stream,
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(4, 6), (3, 3), (8, 2)]
    ]
    imgs[0][0, 0] = (80, 54, 10)  # b'P6' inside pixel data
    stream = b"".join(encode_ppm(p) for p in imgs)
    frames = _split_ppm_stream(stream)
    assert len(frames) == 3
    for f, p in zip(frames, imgs):
        assert np.array_equal(decode_ppm(f), p)
    assert _split_ppm_stream(b"") == []
    with pytest.raises(ValueError):
        _split_ppm_stream(stream[:-1])


def test_decode_features_error_distinguishes_missing_path():
    """An audio row with an undecodable codec must say 'no decode path', not
    blame a dependency; image/video name their actual dependency (ADVICE r3)."""
    import pytest

    from goffish_v3_spark.operators.multimodal import _decode_features

    with pytest.raises(NotImplementedError, match="no decode path"):
        _decode_features(b"xx", "mp3", "audio", 4, "real")


def test_split_ppm_stream_rejects_16bit_samples():
    """maxval-65535 PPM (>8-bit source without -pix_fmt rgb24) must raise a
    clear error, not desync at 3 bytes/pixel (ADVICE r4)."""
    import pytest

    from goffish_v3_spark.operators.multimodal import _split_ppm_stream

    buf = b"P6\n2 2\n65535\n" + b"\x00" * (2 * 2 * 6)
    with pytest.raises(ValueError, match="maxval"):
        _split_ppm_stream(buf)
