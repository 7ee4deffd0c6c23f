"""AVI/MJPEG video decode: mux/demux round-trips, sampling math, and the
Spark frame-sampling pipeline feeding the existing image operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.functions.codecs import decode_png
from markdown_lab_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
)
from markdown_lab_spark.functions.video import (
    decode_avi_frames,
    encode_avi,
    is_avi,
    parse_avi,
    sample_video_frames,
)


def _block_frames(n: int, h: int = 16, w: int = 24, seed: int = 7):
    """Frames whose 8x8 blocks are constant -> MJPEG (DCT) is exact."""
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n):
        blocks = rng.integers(0, 256, size=(h // 8, w // 8, 3), dtype=np.uint8)
        frames.append(np.kron(blocks, np.ones((8, 8, 1), dtype=np.uint8)))
    return frames


def test_raw_roundtrip_exact_arbitrary_pixels():
    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(10, 13, 3), dtype=np.uint8) for _ in range(4)
    ]  # odd width exercises the 4-byte DIB stride padding
    payload = encode_avi(frames, fps_num=12, fps_den=1, codec="raw")
    assert is_avi(payload)
    w, h, fps, out = decode_avi_frames(payload)
    assert (w, h, fps) == (13, 10, 12.0)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, got), want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_mjpeg_roundtrip_bounded_error_on_block_constant_frames():
    # RGB JPEG is bounded-error, not exact (YCbCr rounding both ways) —
    # same <= 10 bound test_codecs.py pins for the still-image codec
    frames = _block_frames(3)
    payload = encode_avi(frames, fps_num=30, fps_den=1, codec="mjpeg")
    info = parse_avi(payload)
    assert info["codec"] == "mjpeg" and info["n_frames"] == 3
    _, _, _, out = decode_avi_frames(payload)
    assert [i for i, _ in out] == [0, 1, 2]
    for (_, got), want in zip(out, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 10


def test_every_n_and_max_frames_and_fraction_fps():
    frames = _block_frames(10)
    payload = encode_avi(frames, fps_num=30000, fps_den=1001, codec="raw")
    w, h, fps, out = decode_avi_frames(payload, every_n_frames=3)
    assert [i for i, _ in out] == [0, 3, 6, 9]
    assert fps == pytest.approx(29.97, abs=0.01)
    _, _, _, out2 = decode_avi_frames(payload, every_n_frames=3, max_frames=2)
    assert [i for i, _ in out2] == [0, 3]


def test_demux_survives_missing_idx1_and_torn_tail():
    payload = encode_avi(_block_frames(4), codec="raw")
    # strip idx1 (everything after the movi LIST) and fix the RIFF size
    idx_at = payload.rindex(b"idx1")
    torn = payload[:idx_at]
    torn = torn[:4] + struct.pack("<I", len(torn) - 8) + torn[8:]
    assert parse_avi(torn)["n_frames"] == 4
    # tear mid-frame: the incomplete chunk is dropped, earlier frames kept
    half = parse_avi(payload[: idx_at - 40])
    assert 0 < half["n_frames"] < 4


def test_decoder_boundary_contract():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00AVI ")  # header only, no streams
    with pytest.raises(ValueError):
        parse_avi(b"not a container")
    # foreign codec fourcc -> ValueError from decode (not a crash)
    payload = bytes(encode_avi(_block_frames(1), codec="mjpeg")).replace(
        b"MJPG", b"H264"
    )
    info = parse_avi(payload)
    assert info["codec"] == "h264"
    with pytest.raises(ValueError):
        decode_avi_frames(bytes(payload))


def test_spark_sampling_pipeline_feeds_image_operators(spark):
    frames = _block_frames(8, seed=11)
    avi = encode_avi(frames, fps_num=2, fps_den=1, codec="raw")  # 4 s long
    rows = [
        (1, "video", bytearray(avi), "video/x-msvideo", {"duration_s": "4"}),
        (2, "video", bytearray(b"\x00bogus"), "video/mp4", {}),
        (3, "image", bytearray(b"notavideo"), "image/png", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_video_frames(media, every_n_seconds=1.0).orderBy("frame_index")
    got = out.collect()
    # fps=2, every 1 s -> every 2nd frame; bogus + non-video rows emit nothing
    assert [r["frame_index"] for r in got] == [0, 2, 4, 6]
    assert [r["frame_ts_s"] for r in got] == [0.0, 1.0, 2.0, 3.0]
    assert got[0]["width"] == 24 and got[0]["height"] == 16
    # PNG payloads decode back to the exact source frames
    for r in got:
        w, h, ch, px = decode_png(bytes(r["frame_png"]))
        np.testing.assert_array_equal(px, frames[r["frame_index"]])
    # and flow straight into the existing image-features pipeline
    as_images = out.select(
        (F.col("media_id") * 100 + F.col("frame_index")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("frame_png").alias("payload"),
        F.lit("image/png").alias("mime"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    feats = extract_image_features(as_images).collect()
    assert len(feats) == 4 and all(f["width"] == 24 for f in feats)
