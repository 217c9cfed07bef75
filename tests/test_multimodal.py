"""Multimodal plumbing: schema, mapInPandas batching, stubbed decode."""

import hashlib

import pytest
from pyspark.sql import functions as F

from e2e_el_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        ("m1", "image", b"\x89PNGfake1", "image/png", 4, 4, 0),
        ("m2", "image", b"\x89PNGfake2", "image/png", 4, 4, 0),
        ("v1", "video", b"\x00\x00ftypmp4", "video/mp4", 640, 480, 3500),
    ]
    return spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_decode_fake_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a.shape == (4, 4, 3)
    assert (a == b).all()
    assert (decode_image(b"other", fake=True) != a).any()


def test_extract_features_schema_and_determinism(spark):
    media = _media(spark)
    f1 = {r.media_id: r for r in extract_features(media, dim=16).collect()}
    f2 = {r.media_id: r for r in extract_features(media, dim=16).collect()}
    assert set(f1) == {"m1", "m2", "v1"}
    for mid in f1:
        assert len(f1[mid].feat) == 16
        assert f1[mid].feat == f2[mid].feat
        assert f1[mid].sha1 == hashlib.sha1(
            {"m1": b"\x89PNGfake1", "m2": b"\x89PNGfake2", "v1": b"\x00\x00ftypmp4"}[mid]
        ).hexdigest()
    assert f1["m1"].feat != f1["m2"].feat


def test_frame_sample_plan(spark):
    media = _media(spark)
    frames = frame_sample_plan(media, every_ms=1000)
    got = sorted((r.media_id, r.frame_ts_ms) for r in frames.collect())
    assert got == [("v1", 0), ("v1", 1000), ("v1", 2000), ("v1", 3000)]
