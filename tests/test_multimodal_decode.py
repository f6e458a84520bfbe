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


def test_bmp_decode_is_real_without_pil():
    """The stdlib BMP codec decodes hand-rolled BMPs with NO PIL
    (VERDICT r3 next-#8): width/height and the exact pixel mean."""
    meta = decode_image(_bmp_bytes(width=2, height=2))
    assert (meta["width"], meta["height"]) == (2, 2)
    # rows: pixels (0,100,200) and (40,100,200) -> mean of all bytes
    assert meta["px_mean"] == pytest.approx((0 + 100 + 200 + 40 + 100 + 200) / 6)
    meta = decode_media_real(_bmp_bytes(), "image")
    assert meta["mode"] == "BGR"


def test_bmp_roundtrip_matches_numpy_reference():
    """encode_bmp24 -> decode_bmp24 over a gradient with an odd width
    (exercises row padding): decoded mean equals the numpy mean of the
    source array bit-for-bit."""
    import numpy as np

    from sports_betting_data_pipeline_spark.functions.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    w, h = 5, 3  # odd width -> 1-byte row padding
    pixels = (np.arange(w * h * 3, dtype=np.uint64) * 37 % 256).astype(
        np.uint8
    ).reshape(h, w, 3)
    meta = decode_bmp24(encode_bmp24(w, h, pixels))
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["px_mean"] == float(pixels.astype(np.float64).mean())


def test_bmp_decode_topdown_and_garbage():
    import struct

    import numpy as np

    from sports_betting_data_pipeline_spark.functions.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    w, h = 2, 2
    pixels = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    payload = bytearray(encode_bmp24(w, h, pixels))
    # flip to top-down (negative height) and re-order rows accordingly
    struct.pack_into("<i", payload, 22, -h)
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    stride = 8  # 2 px * 3 B + 2 pad
    rows = bytes(payload[data_offset:])
    payload[data_offset:] = rows[stride:] + rows[:stride]
    meta = decode_bmp24(bytes(payload))
    assert meta["px_mean"] == float(pixels.astype(np.float64).mean())
    with pytest.raises(ValueError):
        decode_image(b"BMgarbage")
    with pytest.raises(ValueError):
        decode_bmp24(b"not a bmp")


def test_non_bmp_image_still_pil_gated():
    """NotImplementedError is reserved for true codec absence: a PNG
    payload without PIL importable."""
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    if _pil_image() is None:
        with pytest.raises(NotImplementedError):
            decode_image(png_magic)
    else:
        with pytest.raises(ValueError):
            decode_image(png_magic)
