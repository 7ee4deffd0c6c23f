"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested. Decode is REAL for the
formats implementable without a codec library — PNG (stdlib zlib + the
five spec filters, ``codecs.py``), baseline JPEG (pure-numpy huffman +
IDCT, ``jpeg.py``), GIF (LZW + interlacing, ``codecs.py``), and 16-bit
PCM WAV (stdlib wave) — selected by magic-byte sniffing; anything else
(progressive JPEG, video codecs)
falls back to ``decode_image_stub``, a deterministic fake (dimensions
and a checksum derived from the bytes) that raises
``NotImplementedError`` when ``strict=True``.

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
    """mapInPandas decode/feature pipeline with byte-aware batching.

    PNG payloads (magic-sniffed) are decoded for real — width/height from
    IHDR, feature from the un-filtered pixels; other payloads use the
    deterministic stub (no codec libs in this environment)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs, jpeg  # noqa: PLC0415

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
                    try:
                        if codecs.is_png(payload):
                            w, h, ch, px = codecs.decode_png(payload)
                            feat = codecs.image_features_from_pixels(w, h, ch, px)
                        elif jpeg.is_jpeg(payload):
                            w, h, ch, px = jpeg.decode_jpeg(payload)
                            feat = codecs.image_features_from_pixels(w, h, ch, px)
                        elif codecs.is_gif(payload):
                            w, h, ch, px = codecs.decode_gif(payload)
                            feat = codecs.image_features_from_pixels(w, h, ch, px)
                        else:
                            w, h, feat = decode_image_stub(payload)
                    except ValueError:
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


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, zcr double"
)


def extract_audio_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Real audio decode for 16-bit PCM WAV (stdlib wave): sample rate,
    channel count, duration, RMS level, zero-crossing rate. Non-WAV
    payloads yield a null-features row (decode needs codec libs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs  # noqa: PLC0415

        for pdf in batches:
            start = 0
            while start < len(pdf):
                part = pdf.iloc[start : start + batch_rows]
                start += batch_rows
                rows = []
                for media_id, raw in zip(part["media_id"], part["payload"]):
                    payload = bytes(raw or b"")
                    if codecs.is_wav(payload):
                        try:
                            rate, nch, samples = codecs.decode_wav(payload)
                            f = codecs.audio_features(rate, nch, samples)
                            rows.append({"media_id": media_id, **f})
                            continue
                        except ValueError:
                            pass
                    rows.append(
                        {
                            "media_id": media_id,
                            "sample_rate": None,
                            "n_channels": None,
                            "n_samples": None,
                            "duration_s": None,
                            "rms": None,
                            "zcr": None,
                        }
                    )
                yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
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


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(
    media: DataFrame, out_w: int, out_h: int, batch_rows: int = 64
) -> DataFrame:
    """Decode (PNG/JPEG) -> nearest-neighbor resize -> re-encode as PNG.

    The standard pre-training normalization step (fixed input dims).
    Payloads the codecs cannot decode are dropped (they'd need the
    stubbed native path); output payloads are always PNG so downstream
    stages face ONE format.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs, jpeg  # noqa: PLC0415

        for pdf in batches:
            start = 0
            while start < len(pdf):
                part = pdf.iloc[start : start + batch_rows]
                start += batch_rows
                rows = []
                for media_id, raw in zip(part["media_id"], part["payload"]):
                    payload = bytes(raw or b"")
                    try:
                        if codecs.is_png(payload):
                            _w, _h, _c, px = codecs.decode_png(payload)
                        elif jpeg.is_jpeg(payload):
                            _w, _h, _c, px = jpeg.decode_jpeg(payload)
                        elif codecs.is_gif(payload):
                            _w, _h, _c, px = codecs.decode_gif(payload)
                        else:
                            continue
                    except ValueError:
                        continue
                    resized = codecs.resize_nearest(px, out_w, out_h)
                    rows.append(
                        {
                            "media_id": media_id,
                            "width": out_w,
                            "height": out_h,
                            "payload": codecs.encode_png(resized),
                        }
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "width", "height", "payload"],
                )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, RESIZED_SCHEMA
    )
