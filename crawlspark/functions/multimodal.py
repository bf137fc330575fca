"""Multimodal column plumbing: image/audio/video as opaque binary.

A training-data pipeline at 100 TB carries media as ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so bytes never round-trip
through the driver and each task handles one Arrow batch of blobs.

The actual codec work needs image/audio libraries this container does
not ship, so the decode kernel is STUBBED: ``decode_stub=True`` (the
default here) derives deterministic fake features from the bytes
(shape from a seeded hash, mean from a byte checksum), keeping every
Spark-side piece — schema, partitioning, UDF signature, batch shape —
real and tested.  Swap ``_decode_image`` for a Pillow/libvips call on a
real cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_DDL = (
    "media_id bigint, kind string, n_bytes bigint, sha1 string, "
    "width int, height int, mean_intensity double, frames_sampled int"
)


def _decode_image(payload: bytes, stub: bool):
    """Return (width, height, mean_intensity).  Stub: deterministic
    fake derived from the bytes; real impl would decode the codec."""
    if not stub:
        raise NotImplementedError(
            "real image decode requires Pillow/libvips — not in this container"
        )
    h = hashlib.sha1(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean = sum(payload[:4096]) / max(1, min(len(payload), 4096)) / 255.0
    return width, height, round(mean, 6)


def extract_media_features(
    media: DataFrame, frame_stride_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract media blobs via mapInPandas.

    One Arrow batch of blobs per invocation; output one feature row per
    media row (video rows also report how many frames a sampler at
    ``frame_stride_ms`` would touch).
    """

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload) if payload is not None else b""
                sha = hashlib.sha1(b).hexdigest()
                if kind == "image":
                    w, h, mean = _decode_image(b, decode_stub)
                    frames = 1
                elif kind == "video":
                    w, h, mean = _decode_image(b, decode_stub)
                    frames = max(1, int(dur or 0) // frame_stride_ms)
                else:  # audio & friends: no spatial dims
                    w, h = 0, 0
                    mean = round(sum(b[:4096]) / max(1, min(len(b), 4096)) / 255.0, 6)
                    frames = 0
                rows.append((int(mid), kind, len(b), sha, w, h, mean, frames))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "sha1",
                    "width", "height", "mean_intensity", "frames_sampled",
                ],
            )

    return media.mapInPandas(gen, FEATURES_DDL)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (8 + i % 5)
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                None,
                None,
                (i % 10) * 1500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_DDL)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes blobs through the same mapInPandas shape
    with target dims recorded; the pixel work is the stubbed kernel."""
    return media.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )
