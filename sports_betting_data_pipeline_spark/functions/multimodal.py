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


def decode_media_real(payload: bytes, media_type: str):
    """Integration point for real codecs — not available in this
    container (no PIL/av/librosa baked in)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "real media decode requires an image/audio codec library; "
            "this environment ships none (build brief: stub the decode step)"
        ) from exc
    raise NotImplementedError("codec wiring not implemented in this environment")


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: byte statistics + an 8-dim seeded projection
    of the byte histogram (the deterministic stand-in for a real
    image/audio feature extractor)."""
    rng = np.random.default_rng(7)
    proj = rng.standard_normal((256, FEATURE_DIM)).astype(np.float64)
    for pdf in batches:
        out = []
        for asset_id, media_type, payload in zip(
            pdf["asset_id"], pdf["media_type"], pdf["payload"]
        ):
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
        yield pd.DataFrame(out)


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
