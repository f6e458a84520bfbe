"""Real-codec decode wiring (VERDICT r2 next-#7): stdlib WAV decode is
always real; image decode is PIL-gated with NotImplementedError ONLY
on true absence. Payloads are stdlib-constructed (wave module, hand-
rolled BMP) — no codec libs needed to build them."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from sports_betting_data_pipeline_spark.functions.multimodal import (
    _pil_image,
    decode_audio_wav,
    decode_image,
    decode_media_real,
)


def _wav_bytes(n_frames=800, rate=8000, amp=1000):
    """Mono 16-bit sine WAV via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * 440 * i / rate)))
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _bmp_bytes(width=2, height=2):
    """Hand-rolled 24-bit BMP (BITMAPINFOHEADER), rows padded to 4
    bytes — constructible with struct alone."""
    row = bytes()
    for x in range(width):
        row += bytes((x * 40 % 256, 100, 200))  # BGR
    pad = (4 - len(row) % 4) % 4
    pixel_data = (row + b"\x00" * pad) * height
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + len(dib) + len(pixel_data), 0, 0, 14 + len(dib)
    )
    return header + dib + pixel_data


def test_wav_decode_is_real():
    meta = decode_audio_wav(_wav_bytes())
    assert meta["n_channels"] == 1
    assert meta["sample_rate"] == 8000
    assert meta["n_frames"] == 800
    # 440Hz sine at amp 1000 -> RMS ~ 1000/sqrt(2)
    assert abs(meta["rms"] - 1000 / math.sqrt(2)) < 25


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_audio_wav(b"not a wav at all")


def test_media_dispatch():
    meta = decode_media_real(_wav_bytes(), "audio")
    assert meta["sample_rate"] == 8000
    with pytest.raises(NotImplementedError):
        decode_media_real(b"\x00" * 16, "video")


def test_image_decode_both_ways():
    """With PIL: real decode of the stdlib-built BMP. Without PIL:
    NotImplementedError — and ONLY then (true absence)."""
    payload = _bmp_bytes()
    if _pil_image() is not None:
        meta = decode_image(payload)
        assert (meta["width"], meta["height"]) == (2, 2)
        assert 0.0 <= meta["px_mean"] <= 255.0
        with pytest.raises(ValueError):
            decode_image(b"garbage")
    else:
        with pytest.raises(NotImplementedError):
            decode_image(payload)
        with pytest.raises(NotImplementedError):
            decode_media_real(payload, "image")
