"""Matroska/WebM demux: EBML varints, Segment/Tracks/Cluster walking,
SimpleBlock and BlockGroup forms, CodecPrivate avcC, block-timestamp
display ordering for B streams, torn tails, error boundaries, and the
Spark frame-sampling dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from markdown_lab_spark.functions import h264, mkv
from markdown_lab_spark.functions.codecs import decode_png
from markdown_lab_spark.functions.h264 import decode_h264, encode_h264
from markdown_lab_spark.functions.mkv import (
    decode_mkv_frames,
    encode_mkv,
    is_mkv,
    parse_mkv,
)
from markdown_lab_spark.functions.mpeg1 import rgb_to_ycbcr420, ycbcr420_to_rgb
from markdown_lab_spark.functions.multimodal import MEDIA_SCHEMA
from markdown_lab_spark.functions.video import sample_video_frames


def _frames(n: int = 6, h: int = 32, w: int = 48, seed: int = 3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return [np.roll(base, 2 * t, axis=1) for t in range(n)]


def test_ebml_varint_roundtrip():
    for v in (0, 1, 126, 127, 128, 16382, 16383, 2**21 - 2, 2**28 - 2,
              2**35 - 2, 2**49 - 2):
        enc = mkv._enc_vint_size(v)
        got, pos = mkv._read_vint(enc, 0, keep_marker=False)
        assert got == v and pos == len(enc)
    # element IDs keep the marker bit (registry quoting convention)
    for eid in (0xAE, 0xD7, 0x63A2, 0x2AD7B1, 0x1A45DFA3, 0x18538067):
        enc = mkv._enc_vint_id(eid)
        got, pos = mkv._read_vint(enc, 0, keep_marker=True)
        assert got == eid and pos == len(enc)
    with pytest.raises(ValueError, match="varint"):
        mkv._read_vint(b"\x00", 0, keep_marker=False)


def test_mkv_roundtrip_matches_raw_annexb_decode():
    frames = _frames(6)
    pay = encode_mkv(frames, qp=24, fps=25.0, gop=3)
    pics, (w, h, _) = decode_h264(encode_h264(frames, qp=24, fps=25.0, gop=3))
    mw, mh, fps, got = decode_mkv_frames(pay)
    assert (mw, mh) == (w, h) == (48, 32)
    assert fps == pytest.approx(25.0)
    assert len(got) == len(pics) == 6
    for (idx, rgb), pic in zip(got, pics):
        np.testing.assert_array_equal(rgb, ycbcr420_to_rgb(*pic))
    info = parse_mkv(pay)
    assert info["display_order"] == list(range(6))
    assert info["sync"] == [0, 3]  # two IDRs at gop=3
    assert info["timestamp_scale"] == 1_000_000


def test_mkv_b_frames_display_order_and_bit_equality():
    frames = _frames(6)
    for kw in (
        {"b_frames": 2},
        {"b_frames": 2, "cluster_blocks": 2},
        {"b_frames": 1, "use_block_groups": True},
        {"b_frames": 2, "direct_spatial": True},
    ):
        pay = encode_mkv(frames, qp=28, fps=30.0, gop=6, **kw)
        info = parse_mkv(pay)
        disp = [d for d, _ in h264._gop_encode_order(6, 6, kw["b_frames"])]
        assert info["display_order"] == sorted(
            range(6), key=lambda k: disp[k]), kw
        assert info["sync"] == [0]
        w, h, fps, out = decode_mkv_frames(pay)
        assert (w, h) == (48, 32) and fps == pytest.approx(30.0, abs=1e-4)
        rec = h264.encode_h264_reconstruction(
            frames, qp=28, gop=6,
            b_frames=kw["b_frames"],
            direct_spatial=kw.get("direct_spatial", False))
        assert [i for i, _ in out] == list(range(6))
        for (_, rgb), rc in zip(out, rec):
            np.testing.assert_array_equal(rgb, ycbcr420_to_rgb(*rc))


def test_mkv_pcm_frames_lossless():
    frames = _frames(3)
    pay = encode_mkv(frames, qp=40, gop=0, pcm_every=1)
    _, _, _, got = decode_mkv_frames(pay)
    assert len(got) == 3
    for idx, rgb in got:
        np.testing.assert_array_equal(
            rgb, ycbcr420_to_rgb(*rgb_to_ycbcr420(frames[idx])))


def test_mkv_sampling_and_torn_tail():
    frames = _frames(8)
    pay = encode_mkv(frames, qp=26, fps=2.0, gop=4, cluster_blocks=3)
    w, h, fps, got = decode_mkv_frames(pay, every_n_frames=2, max_frames=3)
    assert [i for i, _ in got] == [0, 2, 4]
    # torn tail: drop bytes mid-final-cluster; whole blocks still decode
    torn = pay[: len(pay) - 40]
    _, _, _, got2 = decode_mkv_frames(torn)
    assert 0 < len(got2) < 8
    pics, _ = decode_h264(encode_h264(frames, qp=26, fps=2.0, gop=4))
    for idx, rgb in got2:
        np.testing.assert_array_equal(rgb, ycbcr420_to_rgb(*pics[idx]))


def _streamed_variant(pay: bytes) -> bytes:
    """Rewrite a sized MKV so the Segment and EVERY Cluster carry the
    unknown-size marker — the live-streaming convention the docstring
    cites (no element sizes known while writing)."""
    eid, p = mkv._read_vint(pay, 0, keep_marker=True)
    assert eid == mkv._EBML
    esize, p = mkv._read_vint(pay, p, keep_marker=False)
    head_end = p + esize
    out = bytearray(pay[:head_end])
    eid, p = mkv._read_vint(pay, head_end, keep_marker=True)
    assert eid == mkv._SEGMENT
    ssize, p = mkv._read_vint(pay, p, keep_marker=False)
    seg_end = p + ssize
    out += mkv._enc_vint_id(mkv._SEGMENT) + b"\xff"  # unknown size
    pos = p
    while pos < seg_end:
        eid, q = mkv._read_vint(pay, pos, keep_marker=True)
        size, q = mkv._read_vint(pay, q, keep_marker=False)
        if eid == mkv._CLUSTER:
            out += mkv._enc_vint_id(mkv._CLUSTER) + b"\xff"
            out += pay[q : q + size]
        else:
            out += pay[pos : q + size]
        pos = q + size
    return bytes(out)


def test_mkv_streamed_unknown_size_clusters_keep_all_clusters():
    """Round-5 ADVICE: in streamed files where EVERY Cluster has unknown
    size, only the first cluster's blocks used to survive (the walk
    consumed to Segment end); the unknown-size Cluster must instead end
    at the next Cluster start, so every frame decodes identically to
    the sized layout."""
    frames = _frames(8)
    pay = encode_mkv(frames, qp=26, fps=2.0, gop=4, cluster_blocks=3)
    streamed = _streamed_variant(pay)
    assert streamed != pay
    w0, h0, f0, got0 = decode_mkv_frames(pay)
    w1, h1, f1, got1 = decode_mkv_frames(streamed)
    assert (w0, h0, f0) == (w1, h1, f1)
    assert len(got1) == len(got0) == 8
    for (i0, rgb0), (i1, rgb1) in zip(got0, got1):
        assert i0 == i1
        np.testing.assert_array_equal(rgb0, rgb1)


def test_mkv_laced_block_raises_typed_error():
    """Round-5 ADVICE: lacing flags (0x06) were ignored — a laced block
    treated as one AVCC payload yields a corrupt NAL stream. It must
    raise the typed MKV error instead."""
    frames = _frames(2)
    pay = bytearray(encode_mkv(frames, qp=30))
    # locate the first SimpleBlock's flags byte and set Xiph lacing
    eid, p = mkv._read_vint(pay, 0, keep_marker=True)
    esize, p = mkv._read_vint(pay, p, keep_marker=False)
    pos = p + esize
    eid, p = mkv._read_vint(pay, pos, keep_marker=True)
    ssize, seg_start = mkv._read_vint(pay, p, keep_marker=False)
    hit = False
    for eid, cs, ce in mkv._walk(pay, seg_start, seg_start + ssize):
        if eid != mkv._CLUSTER:
            continue
        for bid, bs, be in mkv._walk(pay, cs, ce):
            if bid == mkv._SIMPLE_BLOCK:
                _tn, q = mkv._read_vint(pay, bs, keep_marker=False)
                pay[q + 2] |= 0x02  # Xiph lacing
                hit = True
                break
        if hit:
            break
    assert hit
    with pytest.raises(ValueError, match="MKV"):
        parse_mkv(bytes(pay))


def test_mkv_error_boundaries():
    assert not is_mkv(b"\x00\x00\x00\x14ftypisom")
    with pytest.raises(ValueError, match="MKV"):
        parse_mkv(b"\x1a\x45\xdf\xa3" + b"\x00" * 10)
    frames = _frames(2)
    pay = encode_mkv(frames, qp=30)
    # foreign doctype is refused, not mis-parsed
    bad = pay.replace(b"matroska", b"quixotic")
    with pytest.raises(ValueError, match="MKV"):
        parse_mkv(bad)
    # non-AVC codec id is refused
    bad = pay.replace(b"V_MPEG4/ISO/AVC", b"V_VP9\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="MKV"):
        parse_mkv(bad)


def test_spark_sampling_dispatches_mkv(spark):
    frames = _frames(8)
    pay = encode_mkv(frames, qp=26, fps=2.0, gop=4)  # 4 s of video
    rows = [
        (1, "video", bytearray(pay), "video/x-matroska", {"duration_s": "4"}),
        (2, "video", bytearray(b"\x1a\x45\xdf\xa3garbage"), "video/webm", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = (
        sample_video_frames(media, every_n_seconds=1.0)
        .orderBy("frame_index")
        .collect()
    )
    assert [r["frame_index"] for r in got] == [0, 2, 4, 6]
    assert got[0]["width"] == 48 and got[0]["height"] == 32
    pics, _ = decode_h264(encode_h264(frames, qp=26, fps=2.0, gop=4))
    for r in got:
        _, _, _, px = decode_png(bytes(r["frame_png"]))
        np.testing.assert_array_equal(
            px, ycbcr420_to_rgb(*pics[r["frame_index"]])
        )
