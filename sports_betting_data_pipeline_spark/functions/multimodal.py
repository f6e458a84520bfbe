"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas over ``mapInPandas``.

The container has no image/audio codecs (per the build brief), so the
DECODE step is stubbed two ways:
- :func:`decode_media_real` raises ``NotImplementedError`` unless PIL
  is importable — the marked integration point for real codecs;
- :func:`extract_features` runs a deterministic fake "decode" (byte
  statistics + a seeded byte-projection embedding) so the Spark-side
  plumbing — binary schema, partitioning, UDF signature, Arrow batch
  shape — is real and testable end-to-end.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch.
Binary payloads travel in the same columnar batches as metadata — at
100 TB the payload column dominates, so queries that only need
metadata must select it away BEFORE any mapInPandas (column pruning
cannot reach inside a UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """Deterministic MEDIA_ASSET rows from the documents fixture: the
    utf-8 text bytes stand in for an opaque media payload; metadata is
    derived from doc_id so tests are reproducible."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.pmod(F.col("doc_id"), F.lit(16)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(9)) * 64 + 64).cast("int").alias("height"),
        (F.pmod(F.col("doc_id"), F.lit(120)) * 1000).alias("duration_ms"),
        F.lit("synthetic/v1").alias("codec"),
    )


def _pil_image():
    """Import seam for the optional image codec (PIL)."""
    try:
        from PIL import Image
    except ImportError:
        return None
    return Image


def encode_bmp24(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER).

    ``pixels``: uint8 array of shape (height, width, 3) in BGR channel
    order, row 0 = TOP row (the writer flips to BMP's bottom-up
    layout). Stdlib-only — the encode half of the no-PIL image codec
    (VERDICT r3 next-#8).
    """
    import struct

    row_bytes = width * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    padding = b"\x00" * pad
    for y in range(height - 1, -1, -1):  # bottom-up
        rows.append(pixels[y].astype(np.uint8).tobytes() + padding)
    return header + b"".join(rows)


def decode_bmp24(payload: bytes) -> dict:
    """Minimal uncompressed 24-bit BMP reader (stdlib struct + numpy):
    width/height and the mean over all pixel channel bytes (padding
    excluded). Raises ``ValueError`` on anything but the plain
    BI_RGB 24-bit layout this codec owns."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(payload) < data_offset + stride * height:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, :row_bytes]
    rows = raw[::-1] if bottom_up else raw
    pixels = rows.reshape(height, width, 3)
    return {
        "width": int(width),
        "height": int(height),
        "mode": "BGR",
        "px_mean": float(pixels.mean()) if pixels.size else 0.0,
    }


def decode_image(payload: bytes) -> dict:
    """Real image decode: the stdlib BMP codec handles uncompressed
    24-bit BMP payloads with no dependencies; everything else goes
    through PIL when importable (the optional-extra wiring, VERDICT r2
    next-#7). ``NotImplementedError`` is reserved for true codec
    absence (JPEG/PNG/... without PIL); malformed bytes raise
    ``ValueError``."""
    if payload[:2] == b"BM":
        return decode_bmp24(payload)
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            "non-BMP image decode requires PIL, which this environment "
            "does not ship (build brief: stub the decode step behind "
            "the plumbing)"
        )
    import io as _io

    try:
        with Image.open(_io.BytesIO(payload)) as img:
            arr = np.asarray(img.convert("L"), dtype=np.float64)
    except Exception as exc:
        raise ValueError(f"undecodable image payload: {exc}") from exc
    return {
        "width": int(arr.shape[1]),
        "height": int(arr.shape[0]),
        "mode": "L",
        "px_mean": float(arr.mean()) if arr.size else 0.0,
    }


def decode_audio_wav(payload: bytes) -> dict:
    """Real audio decode for WAV payloads — stdlib ``wave`` + numpy,
    no optional dependency: channel count, sample rate, frame count,
    and RMS amplitude of the 16-bit samples."""
    import io as _io
    import wave

    try:
        with wave.open(_io.BytesIO(payload), "rb") as wav:
            n_channels = wav.getnchannels()
            sample_rate = wav.getframerate()
            n_frames = wav.getnframes()
            width = wav.getsampwidth()
            frames = wav.readframes(n_frames)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"undecodable WAV payload: {exc}") from exc
    if width == 2:
        samples = np.frombuffer(frames, dtype=np.int16).astype(np.float64)
    elif width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    rms = float(np.sqrt((samples**2).mean())) if samples.size else 0.0
    return {
        "n_channels": int(n_channels),
        "sample_rate": int(sample_rate),
        "n_frames": int(n_frames),
        "rms": rms,
    }


def decode_media_real(payload: bytes, media_type: str) -> dict:
    """Dispatch to the real codec for ``media_type``.

    - ``image``: PIL when importable, else ``NotImplementedError``
      (true absence only — the documented environment limit);
    - ``audio``: stdlib WAV decode, always available;
    - ``video``: no stdlib codec exists — ``NotImplementedError``.
    """
    if media_type == "image":
        return decode_image(payload)
    if media_type == "audio":
        return decode_audio_wav(payload)
    raise NotImplementedError(
        f"no codec for media_type={media_type!r} in this environment "
        "(video decode needs av/ffmpeg, not shipped)"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: byte statistics + an 8-dim seeded projection
    of the byte histogram (the deterministic stand-in for a real
    image/audio feature extractor)."""
    rng = np.random.default_rng(7)
    proj = rng.standard_normal((256, FEATURE_DIM)).astype(np.float64)
    cols = [
        "asset_id", "media_type", "n_bytes",
        "byte_mean", "byte_entropy", "feature",
    ]
    for pdf in batches:
        out = []
        for asset_id, media_type, payload in zip(
            pdf["asset_id"], pdf["media_type"], pdf["payload"]
        ):
            if payload is None:
                # NULL payload (e.g. synthesized from NULL source
                # text): keep the asset row, NULL the stats — the SQL
                # the oracles pin (strlen(NULL) IS NULL) and the only
                # crash-free contract for a 100 TB corpus where some
                # assets are simply absent (fuzz_oracle nulls variant:
                # np.frombuffer(None) killed the whole stage).
                out.append(
                    {
                        "asset_id": asset_id,
                        "media_type": media_type,
                        "n_bytes": None,
                        "byte_mean": None,
                        "byte_entropy": None,
                        "feature": None,
                    }
                )
                continue
            buf = np.frombuffer(payload, dtype=np.uint8)
            counts = np.bincount(buf, minlength=256).astype(np.float64)
            probs = counts / max(buf.size, 1)
            nonzero = probs[probs > 0]
            entropy = float(-(nonzero * np.log2(nonzero)).sum()) if nonzero.size else 0.0
            feature = (probs @ proj).astype(np.float32)
            out.append(
                {
                    "asset_id": asset_id,
                    "media_type": media_type,
                    "n_bytes": int(buf.size),
                    "byte_mean": float(buf.mean()) if buf.size else 0.0,
                    "byte_entropy": entropy,
                    "feature": feature,
                }
            )
        # explicit columns: an empty Arrow batch must still carry the
        # output schema's column set
        yield pd.DataFrame(out, columns=cols)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Only (asset_id, media_type, payload) enter the UDF — callers keep
    wide metadata OUT of the mapInPandas input so the Arrow transfer
    carries the minimum bytes.
    """
    narrow = assets.select("asset_id", "media_type", "payload")
    return narrow.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Video frame-sampling plan: deterministic sample offsets from
    duration metadata (the decode of those frames is the stubbed step).
    Stays JVM-side — planning needs no payload bytes."""
    return assets.filter(F.col("media_type") == "video").select(
        "asset_id",
        F.sequence(
            F.lit(0).cast("long"),
            F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
            F.lit(every_ms).cast("long"),
        ).alias("frame_offsets_ms"),
    )

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_roundtrip_features(documents: DataFrame) -> DataFrame:
    """REAL-codec roundtrip over the multimodal plumbing: synthesize a
    deterministic mono 16-bit WAV per document (stdlib ``wave``
    writer; constant amplitude ``doc_id % 100 + 1``, frame count
    ``n_chars % 50 + 10``, 8 kHz), then decode it with
    :func:`decode_audio_wav` — a genuine encode→bytes→decode pass
    through a binary codec, not a byte-stats fake.

    Because the signal is constant, every decoded field is an exact
    arithmetic function of (doc_id, n_chars): RMS of a constant int16
    signal is exactly |amplitude| in float64 (the squares and their
    mean are exact, sqrt of a perfect square is exact), so the whole
    roundtrip hash-checks against a plain-SQL oracle (m03).

    Scale shape: one mapInPandas over Arrow batches — synth and decode
    stay executor-side, only (asset_id, n_chars) travel in, five
    scalars travel out; the binary payload never crosses the plan.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave

        cols = ["asset_id", "n_channels", "sample_rate", "n_frames", "rms"]
        for pdf in it:
            out = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                if pd.isna(n_chars):
                    # unknown length: nothing to synthesize, so every
                    # decoded field is unknown (int(NaN) used to kill
                    # the stage — fuzz_oracle nulls variant)
                    out.append(
                        {
                            "asset_id": int(doc_id),
                            "n_channels": None,
                            "sample_rate": None,
                            "n_frames": None,
                            "rms": None,
                        }
                    )
                    continue
                amp = int(doc_id) % 100 + 1
                n_frames = int(n_chars) % 50 + 10
                buf = _io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(
                        amp.to_bytes(2, "little", signed=True) * n_frames
                    )
                meta = decode_audio_wav(buf.getvalue())
                out.append(
                    {
                        "asset_id": int(doc_id),
                        "n_channels": meta["n_channels"],
                        "sample_rate": meta["sample_rate"],
                        "n_frames": meta["n_frames"],
                        "rms": meta["rms"],
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return documents.select("doc_id", "n_chars").mapInPandas(
        batches, schema=AUDIO_META_SCHEMA
    )


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("px_mean", T.DoubleType()),
    ]
)


def image_roundtrip_features(documents: DataFrame) -> DataFrame:
    """REAL-codec image roundtrip (the m03 design applied to images,
    VERDICT r3 next-#8): synthesize a solid-color uncompressed 24-bit
    BMP per document with the stdlib codec (width ``doc_id % 6 + 2``,
    height ``n_chars % 5 + 2``, BGR channels derived from
    (doc_id, n_chars)), then decode it with :func:`decode_image`'s BMP
    path — a genuine encode→bytes→decode pass, no PIL required.

    A solid color makes every decoded field an exact arithmetic
    function of (doc_id, n_chars): px_mean of a constant (b, g, r)
    image is exactly ``(b + g + r) / 3`` in IEEE double regardless of
    dimensions, so the roundtrip hash-checks against a plain-SQL
    oracle (m04).

    Scale shape: one mapInPandas over Arrow batches — synth and decode
    stay executor-side, only (doc_id, n_chars) travel in, four scalars
    travel out; the binary payload never crosses the plan.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "width", "height", "px_mean"]
        for pdf in it:
            out = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                if pd.isna(n_chars):
                    # unknown size: nothing to synthesize → unknown out
                    # (int(NaN) used to kill the stage; fuzz_oracle)
                    out.append(
                        {
                            "asset_id": int(doc_id),
                            "width": None,
                            "height": None,
                            "px_mean": None,
                        }
                    )
                    continue
                doc_id, n_chars = int(doc_id), int(n_chars)
                w = doc_id % 6 + 2
                h = n_chars % 5 + 2
                bgr = (doc_id % 256, (doc_id * 7) % 256, (n_chars * 13) % 256)
                pixels = np.tile(
                    np.array(bgr, dtype=np.uint8), (h, w, 1)
                )
                meta = decode_image(encode_bmp24(w, h, pixels))
                out.append(
                    {
                        "asset_id": doc_id,
                        "width": meta["width"],
                        "height": meta["height"],
                        "px_mean": meta["px_mean"],
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return documents.select("doc_id", "n_chars").mapInPandas(
        batches, schema=IMAGE_META_SCHEMA
    )


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.LongType()),
    ]
)


def audio_frame_energy(
    documents: DataFrame, n_frames: int = 4, frame_len: int = 16
) -> DataFrame:
    """Windowed audio feature extraction over a REAL codec pass — the
    per-frame energy/peak profile a speech or music pipeline computes
    before VAD, silence trimming, or loudness normalization (the step
    after m03's whole-file stats).

    Per document a deterministic VARYING int16 signal is synthesized
    (sample ``g`` has amplitude ``(doc_id*(g+1)) % 7 - 3``), written
    through the stdlib ``wave`` encoder, decoded back from the bytes,
    split into ``n_frames`` frames of ``frame_len`` samples, and each
    frame's RMS and absolute peak emitted as one row. Amplitudes are
    tiny integers, so each frame's sum of squares is integer-exact and
    the RMS (sqrt of an exact dyadic mean) is bit-deterministic in
    IEEE double — the whole decode + feature pass hash-checks against
    a generate_series SQL oracle.

    Scale shape: one mapInPandas; only (doc_id) travels in, one row
    per (asset, frame) travels out; payload bytes never cross the
    plan. Frame segmentation is a numpy reshape over the decoded PCM
    — vectorized per Arrow batch, never per-sample Python.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave

        total = n_frames * frame_len
        for pdf in it:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                g = np.arange(total, dtype=np.int64)
                amps = ((doc_id * (g + 1)) % 7 - 3).astype(np.int16)
                buf = _io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(amps.tobytes())
                with wave.open(_io.BytesIO(buf.getvalue()), "rb") as r:
                    pcm = np.frombuffer(
                        r.readframes(r.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                frames = pcm.reshape(n_frames, frame_len)
                sumsq = (frames * frames).sum(axis=1)
                rms = np.sqrt(sumsq / float(frame_len))
                peak = np.abs(frames).max(axis=1)
                for idx in range(n_frames):
                    out.append(
                        {
                            "asset_id": doc_id,
                            "frame_idx": idx,
                            "rms": float(rms[idx]),
                            "peak": int(peak[idx]),
                        }
                    )
            yield pd.DataFrame(out)

    return documents.select("doc_id").mapInPandas(
        batches, schema=FRAME_ENERGY_SCHEMA
    )
