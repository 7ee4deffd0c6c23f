"""Arithmetic-coded sequential JPEG (SOF9, T.81 QM coder): raw-coder
round-trips under skewed statistics and carry/stuffing stress, pixel
equality with the baseline entropy path on identical coefficients,
restart-marker resync with full statistics reset, DAC conditioning,
compression superiority, and the scoped rejections."""

from __future__ import annotations

import numpy as np
import pytest

from markdown_lab_spark.functions import jpeg
from markdown_lab_spark.functions.jpeg_arith import (
    _QM,
    _ArithDecoder,
    _ArithEncoder,
    encode_jpeg_arith,
)

# ---------------------------------------------------------------------------
# state-machine table structural invariants
# ---------------------------------------------------------------------------


def test_qm_table_shape():
    assert len(_QM) == 114
    for i, (qe, nmps, nlps, sw) in enumerate(_QM):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        assert sw in (0, 1)
        # Switch only happens on the "fast attack" high-Qe states
        if sw:
            assert qe >= 0x5000, i
    # the fixed bin maps to itself and never switches MPS sense
    assert _QM[113][1] == 113 and _QM[113][2] == 113 and _QM[113][3] == 0


# ---------------------------------------------------------------------------
# raw coder round-trips
# ---------------------------------------------------------------------------


def test_coder_roundtrip_random_contexts():
    rng = np.random.default_rng(42)
    for _ in range(15):
        n = int(rng.integers(16, 4000))
        p = float(rng.uniform(0.02, 0.98))
        bits = (rng.random(n) < p).astype(int).tolist()
        ctxs = rng.integers(0, 24, n).tolist()
        enc = _ArithEncoder()
        st = bytearray(64)
        for b, cx in zip(bits, ctxs):
            enc.encode(st, cx, b)
        stream = enc.flush()
        dec = _ArithDecoder(stream, 0)
        st2 = bytearray(64)
        assert [dec.decode(st2, cx) for cx in ctxs] == bits


def test_coder_roundtrip_through_stuffed_ff():
    # find a stream containing a stuffed 0xFF00 so the unstuffing branch
    # is provably on the decode path
    for seed in range(64):
        rng = np.random.default_rng(seed)
        bits = (rng.random(4000) < 0.5).astype(int).tolist()
        enc = _ArithEncoder()
        st = bytearray(1)
        for b in bits:
            enc.encode(st, 0, b)
        stream = enc.flush()
        if b"\xff\x00" in stream:
            dec = _ArithDecoder(stream, 0)
            st2 = bytearray(1)
            assert [dec.decode(st2, 0) for _ in bits] == bits
            return
    pytest.fail("no stuffed stream found across seeds")


def test_coder_efficiency_near_entropy_bound():
    # the QM estimator's documented inefficiency is a few percent;
    # a broken state table would blow this bound immediately
    rng = np.random.default_rng(1)
    n, p = 60_000, 0.05
    bits = (rng.random(n) < p).astype(int).tolist()
    enc = _ArithEncoder()
    st = bytearray(1)
    for b in bits:
        enc.encode(st, 0, b)
    stream = enc.flush()
    entropy_bytes = -(p * np.log2(p) + (1 - p) * np.log2(1 - p)) * n / 8
    assert len(stream) < entropy_bytes * 1.10


def test_fixed_bin_is_non_adaptive():
    rng = np.random.default_rng(5)
    bits = (rng.random(800) < 0.5).astype(int).tolist()
    enc = _ArithEncoder()
    for b in bits:
        enc.encode_fixed(b)
    dec = _ArithDecoder(enc.flush(), 0)
    assert [dec.decode_fixed() for _ in bits] == bits
    # ~1 bit/symbol: no adaptation gain on the sign lane
    assert len(enc.out) >= len(bits) // 8 - 4


# ---------------------------------------------------------------------------
# image-level: identical coefficients, disjoint entropy paths
# ---------------------------------------------------------------------------


def _test_image(seed=3, shape=(36, 48), color=True):
    rng = np.random.default_rng(seed)
    h, w = shape
    grad = np.linspace(0, 255, w)[None, :] + np.linspace(0, 60, h)[:, None]
    if not color:
        return np.clip(grad + rng.normal(0, 10, shape), 0, 255).astype(np.uint8)
    return np.clip(
        np.stack([grad, grad.T[:h, :w] if grad.T.shape == shape else grad[::-1],
                  rng.uniform(0, 255, shape)], axis=2),
        0, 255,
    ).astype(np.uint8)


def test_gray_matches_baseline_pixels():
    img = _test_image(color=False)
    _, _, _, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    _, _, _, ar = jpeg.decode_jpeg(encode_jpeg_arith(img))
    np.testing.assert_array_equal(base, ar)


def test_color_444_and_420_match_baseline_pixels():
    img = _test_image()
    for sub in (False, True):
        _, _, _, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsample=sub))
        _, _, _, ar = jpeg.decode_jpeg(encode_jpeg_arith(img, subsample=sub))
        np.testing.assert_array_equal(base, ar)


def test_restart_markers_resync_and_reset():
    img = _test_image(seed=11)
    for ri in (1, 2, 3):
        _, _, _, base = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, subsample=True, restart_interval=ri)
        )
        payload = encode_jpeg_arith(img, subsample=True, restart_interval=ri)
        assert any(
            bytes([0xFF, 0xD0 + k]) in payload for k in range(8)
        ), "no RST emitted"
        _, _, _, ar = jpeg.decode_jpeg(payload)
        np.testing.assert_array_equal(base, ar)


def test_dac_conditioning_roundtrip():
    img = _test_image(seed=17)
    for dc_l, dc_u, kx in ((0, 1, 5), (1, 3, 12), (0, 2, 1), (2, 4, 63)):
        payload = encode_jpeg_arith(img, dc_l=dc_l, dc_u=dc_u, ac_kx=kx)
        _, _, _, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
        _, _, _, ar = jpeg.decode_jpeg(payload)
        np.testing.assert_array_equal(base, ar)


def test_arith_stream_smaller_than_huffman():
    # same coefficients, so the entropy layer is the only difference;
    # the adaptive QM coder should beat the flat huffman tables easily
    img = _test_image(seed=23, shape=(64, 80))
    assert len(encode_jpeg_arith(img)) < len(jpeg.encode_jpeg(img))


def test_block_constant_closed_form():
    # the q48 fixture shape: constant blocks decode integer-exactly
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    w, h, c, px = jpeg.decode_jpeg(encode_jpeg_arith(img))
    assert (w, h, c) == (32, 24, 1)
    _, _, _, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    np.testing.assert_array_equal(base, px)


def test_truncated_stream_decodes_without_crash():
    # T.81 convention: hitting a marker mid-scan is legal in arithmetic
    # coding — the decoder zero-feeds; a truncated file must not abort
    img = _test_image(seed=29)
    payload = encode_jpeg_arith(img)
    trunc = payload[: len(payload) // 2] + b"\xff\xd9"
    w, h, c, px = jpeg.decode_jpeg(trunc)
    assert (w, h, c) == (48, 36, 3) and px.dtype == np.uint8


def test_12bit_arith_rejected():
    # scope pin: arithmetic is 8-bit only in this engine
    payload = bytearray(encode_jpeg_arith(_test_image(color=False)))
    i = payload.index(b"\xff\xc9") + 4
    payload[i] = 12  # precision byte inside SOF9
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(payload))


def test_multimodal_pipeline_decodes_arith_jpeg(spark):
    from markdown_lab_spark.functions.multimodal import extract_image_features

    img = _test_image(seed=31, shape=(24, 32))
    rows = [
        (1, "image", bytearray(encode_jpeg_arith(img)), "image/jpeg", {}),
        (2, "image", bytearray(jpeg.encode_jpeg(img)), "image/jpeg", {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    out = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert out[1]["width"] == 32 and out[1]["height"] == 24
    # identical coefficients -> identical pixels -> identical pixel feature
    # (checksum hashes the payload bytes, which legitimately differ)
    assert out[1]["feature"] == out[2]["feature"]
    assert out[1]["checksum"] != out[2]["checksum"]


# ---------------------------------------------------------------------------
# progressive arithmetic (SOF10)
# ---------------------------------------------------------------------------


def test_progressive_arith_gray_matches_baseline():
    from markdown_lab_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _test_image(color=False)
    _, _, _, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    _, _, _, prog = jpeg.decode_jpeg(encode_jpeg_arith_progressive(img))
    np.testing.assert_array_equal(base, prog)


def test_progressive_arith_color_variants_match_baseline():
    from markdown_lab_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _test_image(seed=9)
    for kwargs in (
        {},
        {"subsample": True},
        {"restart_interval": 2},
        {"subsample": True, "restart_interval": 3},
        {"dc_l": 1, "dc_u": 3, "ac_kx": 20},
    ):
        rkw = {
            k: v for k, v in kwargs.items()
            if k in ("subsample", "restart_interval")
        }
        _, _, _, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, **rkw))
        _, _, _, prog = jpeg.decode_jpeg(
            encode_jpeg_arith_progressive(img, **kwargs)
        )
        np.testing.assert_array_equal(base, prog)


def test_all_four_entropy_paths_agree():
    # baseline huffman, progressive huffman, sequential arithmetic, and
    # progressive arithmetic carry IDENTICAL coefficients — four
    # disjoint entropy organizations, one pixel result
    from markdown_lab_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _test_image(seed=41, shape=(40, 56))
    payloads = [
        jpeg.encode_jpeg(img, subsample=True),
        jpeg.encode_jpeg_progressive(img, subsample=True),
        encode_jpeg_arith(img, subsample=True),
        encode_jpeg_arith_progressive(img, subsample=True),
    ]
    decoded = [jpeg.decode_jpeg(p)[3] for p in payloads]
    for px in decoded[1:]:
        np.testing.assert_array_equal(decoded[0], px)
    # each organization produced a genuinely different byte stream
    assert len({p for p in payloads}) == 4


def test_progressive_arith_nonint_grid_excludes_pad_blocks():
    # odd dims + 4:2:0: single-component AC scans cover the component's
    # own block grid, not the padded MCU grid (T.81 A.2.2)
    from markdown_lab_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _test_image(seed=43, shape=(19, 27))
    _, _, _, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsample=True))
    _, _, _, prog = jpeg.decode_jpeg(
        encode_jpeg_arith_progressive(img, subsample=True)
    )
    np.testing.assert_array_equal(base, prog)


def test_progressive_arith_truncation_partial_but_no_crash():
    from markdown_lab_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _test_image(seed=47)
    payload = encode_jpeg_arith_progressive(img)
    # cut inside a later scan, re-terminate: decodes the scans seen so far
    trunc = payload[: int(len(payload) * 0.7)] + b"\xff\xd9"
    w, h, c, px = jpeg.decode_jpeg(trunc)
    assert (w, h, c) == (48, 36, 3) and px.dtype == np.uint8
