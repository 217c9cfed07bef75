"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shapes, deterministic fake features — while the
actual codec decode is STUBBED (no image/audio libs in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic pseudo-decode derives features from the bytes alone.
Swapping in PIL/torchaudio later only replaces the inner function; the
DataFrame contract is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, width int, "
    "height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, feat array<float>, n_bytes bigint, sha1 string"
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode image bytes → HxWx3 array. STUB: real codecs unavailable here.

    fake=True returns a deterministic 4x4x3 pseudo-image derived from the
    byte content (pure function), so downstream plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True "
            "or plug a real decoder (PIL) into extract_features(decoder=...)"
        )
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((h * 2)[:48], dtype=np.uint8).reshape(4, 4, 3)
    return arr.astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction over BINARY payloads.

    Batched: one numpy pass per Arrow batch, never per-row Python calls into
    Spark. The fake featureizer pools the pseudo-decode + byte stats into a
    ``dim``-float vector — deterministic, schema-stable.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes, shas = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                img = decode_image(b, fake=fake)
                pooled = img.mean(axis=(0, 1))  # 3 channel means
                need = (dim - 3) * 4
                digest = hashlib.sha256(b).digest()
                digest = (digest * (need // len(digest) + 1))[:need]
                hv = np.frombuffer(digest, dtype=np.uint32).astype(np.float32)
                hv = hv / np.float32(2**32)
                feats.append(np.concatenate([pooled / 255.0, hv]).astype(np.float32))
                sizes.append(len(b))
                shas.append(hashlib.sha1(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": [list(f) for f in feats],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "sha1": shas,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode (media_id, frame_ts_ms) rows from
    duration metadata — pure DataFrame math; the actual frame grab is the
    stubbed decode. Demonstrates the partitioning story: one row per frame,
    repartitionable by media_id for locality."""
    from pyspark.sql import functions as F

    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
