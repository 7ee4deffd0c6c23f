"""Baseline TIFF codec: pixel-exact round-trips across compressions,
endianness, predictor, striping; LZW early-change boundary; decoder
boundary contract; image-pipeline dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from markdown_lab_spark.functions.multimodal import _decode_image_any
from markdown_lab_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    is_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


def _img(h=21, w=17, c=3, seed=5):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a[:, :, 0] if c == 1 else a


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("gray", [False, True])
@pytest.mark.parametrize("be", [False, True])
def test_roundtrip_exact(comp, gray, be):
    src = _img(c=1 if gray else 3)
    payload = encode_tiff(src, compression=comp, big_endian=be)
    assert is_tiff(payload)
    w, h, ch, px = decode_tiff(payload)
    assert (w, h, ch) == (17, 21, 1 if gray else 3)
    np.testing.assert_array_equal(px.squeeze(), src)


@pytest.mark.parametrize("comp", ["packbits", "lzw"])
def test_predictor_and_striping(comp):
    # smooth gradients are where predictor 2 pays; multiple strips
    y, x = np.mgrid[0:33, 0:40]
    src = np.stack([(x * 3) % 256, (y * 2) % 256, (x + y) % 256], axis=2).astype(
        np.uint8
    )
    payload = encode_tiff(src, compression=comp, predictor=True, rows_per_strip=7)
    w, h, ch, px = decode_tiff(payload)
    np.testing.assert_array_equal(px, src)
    # predictor actually shrinks LZW output on gradients
    if comp == "lzw":
        plain = encode_tiff(src, compression="lzw", rows_per_strip=7)
        assert len(payload) < len(plain)


def test_packbits_spec_vectors():
    # Apple's published PackBits example (also in the TIFF spec)
    decoded = bytes.fromhex(
        "AAAAAA" + "80002A" + "AA" * 4 + "80002A22" + "AA" * 10
    )
    encoded = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(encoded, len(decoded)) == decoded
    assert packbits_decode(packbits_encode(decoded), len(decoded)) == decoded
    # runs crossing the 128 boundary
    data = b"\x00" * 300 + b"abc" + b"\xff" * 129
    assert packbits_decode(packbits_encode(data), len(data)) == data


def test_lzw_early_change_boundary_roundtrip():
    # enough distinct pairs to push the table past 511 and 1023 entries,
    # exercising the 9->10->11-bit early-change transitions
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=6000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data), len(data)) == data
    # and a highly repetitive stream (deep table strings)
    rep = (b"abcabcabd" * 700) + b"tail"
    assert lzw_decode(lzw_encode(rep), len(rep)) == rep


def test_lzw_table_full_clear_roundtrip():
    # > 4094 table entries forces the encoder's mid-stream Clear
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=30000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data), len(data)) == data


def test_decoder_boundary_contract():
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00\x08\x00\x00\x00")  # truncated IFD
    ok = encode_tiff(_img())
    with pytest.raises(ValueError):
        decode_tiff(ok[: len(ok) // 3])  # torn strip/IFD
    # unsupported compression id -> ValueError, not a crash
    bad = bytearray(encode_tiff(_img(), compression="none"))
    # tag 259 value: find it in the IFD (entries sorted; value at +8)
    idx = bad.rindex((259).to_bytes(2, "little"))
    bad[idx + 8] = 7  # JPEG-in-TIFF
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_dispatch_from_image_pipeline():
    src = _img(seed=9)
    w, h, ch, px = _decode_image_any(encode_tiff(src, compression="lzw"))
    assert (w, h, ch) == (17, 21, 3)
    np.testing.assert_array_equal(px, src)


def test_white_is_zero_photometric():
    src = _img(c=1)
    payload = bytearray(encode_tiff(src))
    idx = payload.rindex((262).to_bytes(2, "little"))
    payload[idx + 8] = 0  # PhotometricInterpretation = WhiteIsZero
    w, h, ch, px = decode_tiff(bytes(payload))
    np.testing.assert_array_equal(px.squeeze(), 255 - src)
