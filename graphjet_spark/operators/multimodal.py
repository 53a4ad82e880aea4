"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched stages.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded from
the payload hash) produces stable pseudo-features.  Everything AROUND
the decode — schema contracts, mapInPandas signatures, batch shapes,
partition sizing — is real and tested; swapping in PIL/ffmpeg later
changes only the marked kernels.

Schema contract:

    media(media_id bigint, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int,
                      duration_ms:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_DIM = 16


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table obeying MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 192)))
        meta = {
            "width": int(rng.integers(16, 512)) if kind != "audio" else None,
            "height": int(rng.integers(16, 512)) if kind != "audio" else None,
            "sample_rate": 16_000 if kind != "image" else None,
            "duration_ms": int(rng.integers(100, 60_000))
            if kind != "image"
            else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payloads: pd.Series, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded from
    the payload content hash (stable across partitionings)."""
    seeds = pd.util.hash_array(payloads.to_numpy(dtype=object)).astype(np.uint64)
    out = np.empty((len(payloads), dim))
    for i, s in enumerate(seeds):  # per-row seeding, vector math per row
        out[i] = np.random.default_rng(s).standard_normal(dim)
    return out


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decoding needs PIL/libjpeg (absent here).

    The Spark-side plumbing (extract_features) never calls this unless
    ``fake=False``."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; use fake=True for the deterministic test decoder"
    )


def extract_features(
    media: DataFrame, *, dim: int = FEATURE_DIM, fake: bool = True
) -> DataFrame:
    """(media_id, kind, features array<double>) via mapInPandas.

    Batch contract: input batches carry (media_id, kind, payload); the
    kernel is Arrow-batched and returns one feature row per media row.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real decoders not available")
            feats = _fake_features(pdf["payload"], dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": list(feats),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _feat, schema="media_id bigint, kind string, features array<double>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms)
    WITHOUT decoding — pure column math on metadata, so the expensive
    decode fan-out is explicit and partition-able before it happens."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata plan (no decode): target dims preserving aspect
    ratio, pure column expressions."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h).cast("double")
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.ceil(w * scale).cast("int").alias("target_width"),
        F.ceil(h * scale).cast("int").alias("target_height"),
    )
