"""Multimodal plumbing: schema, batch shape, deterministic stub decode."""

import pytest

from crawlspark.functions.multimodal import (
    _decode_image,
    extract_media_features,
    synthetic_media,
)


def test_media_features_shape_and_determinism(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_media_features(media).cache()
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    # deterministic: second run identical
    rows2 = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert rows == rows2
    img = rows[0]
    assert img["kind"] == "image" and img["width"] >= 64 and img["height"] >= 64
    aud = rows[1]
    assert aud["kind"] == "audio" and aud["width"] == 0 and aud["frames_sampled"] == 0
    vid = rows[5]
    assert vid["kind"] == "video" and vid["frames_sampled"] >= 1
    assert all(len(r["sha1"]) == 40 for r in rows.values())


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_image(b"\x89PNG", stub=False)
