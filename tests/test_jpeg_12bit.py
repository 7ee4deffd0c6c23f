"""12-bit extended-sequential (SOF1) grayscale JPEG: closed-form exact
block-constant decode, bounded-error gradients, 16-bit DQT parsing, and
the scoped rejections (12-bit color / progressive)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from markdown_lab_spark.functions import jpeg


def _closed_const(v):
    """Decoded 8-bit output of a constant-v 12-bit block (q00=16,
    half-up both ways, then the >>4 boundary scale)."""
    d = np.floor(8 * (v - 2048.0) / 16.0 + 0.5)
    r = np.clip(np.floor(d * 16 / 8.0 + 2048.0 + 0.5), 0, 4095)
    return np.floor(r / 16.0)


def test_block_constant_exact():
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 4096, size=(4, 5), dtype=np.uint16)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint16))
    w, h, ch, px = jpeg.decode_jpeg(jpeg.encode_jpeg_gray12(img))
    assert (w, h, ch) == (40, 32, 1) and px.dtype == np.uint8
    np.testing.assert_array_equal(
        px[::8, ::8, 0].astype(np.float64), _closed_const(blocks.astype(np.float64))
    )
    # extremes survive the range clamp
    for v in (0, 1, 2047, 2048, 4094, 4095):
        one = np.full((8, 8), v, dtype=np.uint16)
        _, _, _, p1 = jpeg.decode_jpeg(jpeg.encode_jpeg_gray12(one))
        assert p1[0, 0, 0] == _closed_const(float(v))


def test_gradient_bounded_error_and_odd_dims():
    y, x = np.mgrid[0:19, 0:27]
    img = ((x * 131 + y * 57) % 4096).astype(np.uint16)
    w, h, ch, px = jpeg.decode_jpeg(jpeg.encode_jpeg_gray12(img))
    assert (w, h, ch) == (27, 19, 1)
    want = img.astype(np.int32) >> 4
    err = np.abs(px[:, :, 0].astype(np.int32) - want).max()
    assert err <= 6, err  # AC quant 32 at 12-bit ~= quant 2 at 8-bit


def test_small_quant_exercises_wide_dc_categories():
    # quant_dc=1 pushes DC diffs into double-digit bit lengths (the
    # categories baseline 8-bit never uses)
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 4096, size=(1, 6), dtype=np.uint16)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint16))
    w, h, ch, px = jpeg.decode_jpeg(jpeg.encode_jpeg_gray12(img, quant_dc=1))
    # q00=1: DC is lossless up to the float DCT -> 12-bit exact -> >>4
    np.testing.assert_array_equal(
        px[0, ::8, 0], (blocks[0].astype(np.int32) >> 4).astype(np.uint8)
    )


def test_sixteen_bit_dqt_is_parsed():
    img = np.full((8, 8), 3000, dtype=np.uint16)
    payload = jpeg.encode_jpeg_gray12(img)
    # the fixture writer emits Pq=1 (one 129-byte DQT segment)
    i = payload.index(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
    assert seglen == 2 + 1 + 128 and payload[i + 4] == 0x10


def test_scope_rejections():
    img = np.full((8, 8), 100, dtype=np.uint16)
    payload = bytearray(jpeg.encode_jpeg_gray12(img))
    i = payload.index(b"\xff\xc1")
    payload[i + 4] = 12  # precision byte stays 12
    payload[i + 1] = 0xC2  # flip SOF1 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(payload))
    payload[i + 1] = 0xC1
    payload[i + 4] = 10  # unsupported precision
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        jpeg.encode_jpeg_gray12(np.full((8, 8), 5000, dtype=np.uint16))


def test_dispatch_magic_sniff():
    from markdown_lab_spark.functions.multimodal import _decode_image_any

    img = np.kron(
        np.array([[512, 1024], [2048, 4095]], dtype=np.uint16),
        np.ones((8, 8), dtype=np.uint16),
    )
    w, h, ch, px = _decode_image_any(jpeg.encode_jpeg_gray12(img))
    assert (w, h, ch) == (16, 16, 1)
