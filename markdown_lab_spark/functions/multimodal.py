"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested; the actual media decode
is STUBBED — codec libraries are not available in this container — behind
``decode_image_stub``, which produces a deterministic fake (dimensions and
a checksum derived from the bytes) or raises ``NotImplementedError`` when
``strict=True``.

Scale notes: media rows are orders of magnitude wider than text rows —
``media_repartition_hint`` sizes partitions by BYTES (not rows) so one
Arrow batch stays within executor memory; decode runs in mapInPandas with
small maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, checksum string, "
    "feature array<float>"
)


def decode_image_stub(payload: bytes, strict: bool = False):
    """STUB decode. Real implementation would use PIL/libvips (not in this
    container). The deterministic fake derives (width, height, 8-dim
    feature) from the payload bytes so tests are reproducible."""
    if strict:
        raise NotImplementedError(
            "image decode requires a codec library not present in this environment"
        )
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    feature = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feature


def extract_image_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """mapInPandas decode/feature pipeline with byte-aware batching."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # guard: re-split oversize Arrow batches by payload bytes
            start = 0
            while start < len(pdf):
                part = pdf.iloc[start : start + batch_rows]
                start += batch_rows
                out = {
                    "media_id": [],
                    "width": [],
                    "height": [],
                    "n_bytes": [],
                    "checksum": [],
                    "feature": [],
                }
                for media_id, raw in zip(part["media_id"], part["payload"]):
                    payload = bytes(raw or b"")
                    w, h, feat = decode_image_stub(payload)
                    out["media_id"].append(media_id)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_bytes"].append(len(payload))
                    out["checksum"].append(hashlib.md5(payload).hexdigest())
                    out["feature"].append(feat)
                yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_ts) rows from the
    declared duration metadata; actual frame extraction is the stubbed
    decode step. Pure JVM (sequence + explode)."""
    duration = F.coalesce(
        F.element_at(F.col("meta"), "duration_s").cast("int"), F.lit(0)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), duration, F.lit(every_n_seconds))
            ).alias("frame_ts"),
        )
    )


def media_repartition_hint(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition media by cumulative payload size so each partition holds
    ~target_bytes (rows are wide; row-count partitioning would OOM)."""
    stats = df.agg(
        F.sum(F.length(F.col("payload"))).alias("total"),
    ).collect()[0]
    total = stats["total"] or 0
    nparts = max(1, int(total // target_bytes) + 1)
    return df.repartition(nparts, F.col("media_id"))
