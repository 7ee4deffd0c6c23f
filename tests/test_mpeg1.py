"""MPEG-1 inter-frame codec (functions/mpeg1.py): VLC table structure,
coefficient/motion unit round-trips, exact-by-construction frame
fixtures for every macroblock path (intra, MC copy, half-pel, coded
residual, skip runs, B fwd/bwd/interpolated), display reordering, and
the Spark frame-sampling integration."""

import numpy as np
import pytest

from markdown_lab_spark.functions import mpeg1 as M


# ---- helpers ---------------------------------------------------------------
def block_constant_frame(h, w, seed):
    """4:2:0 planes where every 8x8 block of every plane is constant —
    the DC-only construction that survives intra coding exactly."""
    rng = np.random.RandomState(seed)
    yb = rng.randint(16, 240, size=(h // 8, w // 8))
    y = np.repeat(np.repeat(yb, 8, axis=0), 8, axis=1).astype(np.uint8)
    cbb = rng.randint(16, 240, size=(h // 16, w // 16))
    crb = rng.randint(16, 240, size=(h // 16, w // 16))
    cb = np.repeat(np.repeat(cbb, 8, axis=0), 8, axis=1).astype(np.uint8)
    cr = np.repeat(np.repeat(crb, 8, axis=0), 8, axis=1).astype(np.uint8)
    return y, cb, cr


def ref_predict(plane, y0, x0, h, w, dy, dx):
    """Independent half-pel prediction reference (the spec's rounding
    averages), reimplemented for the test."""
    iy, ix = y0 + (dy >> 1), x0 + (dx >> 1)
    hy, hx = dy & 1, dx & 1
    p = plane.astype(np.int64)
    a = p[iy : iy + h, ix : ix + w]
    if not hy and not hx:
        return a
    if hx and not hy:
        return (a + p[iy : iy + h, ix + 1 : ix + 1 + w] + 1) >> 1
    if hy and not hx:
        return (a + p[iy + 1 : iy + 1 + h, ix : ix + w] + 1) >> 1
    return (
        a
        + p[iy : iy + h, ix + 1 : ix + 1 + w]
        + p[iy + 1 : iy + 1 + h, ix : ix + w]
        + p[iy + 1 : iy + 1 + h, ix + 1 : ix + 1 + w]
        + 2
    ) >> 2


def chroma_mv(d):
    return d // 2 if d >= 0 else -((-d) // 2)


def shifted_interior(f1, dy, dx):
    """frame2 = f1 with every INTERIOR macroblock replaced by the
    half-pel prediction at (dy, dx); border MBs untouched (zero-vector
    copies). Exercises MC with exactly-zero residual everywhere."""
    y1, cb1, cr1 = (p.astype(np.int64) for p in f1)
    h, w = y1.shape
    y2, cb2, cr2 = y1.copy(), cb1.copy(), cr1.copy()
    for my in range(1, h // 16 - 1):
        for mx in range(1, w // 16 - 1):
            y2[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = ref_predict(
                y1, my * 16, mx * 16, 16, 16, dy, dx
            )
            cdy, cdx = chroma_mv(dy), chroma_mv(dx)
            cb2[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = ref_predict(
                cb1, my * 8, mx * 8, 8, 8, cdy, cdx
            )
            cr2[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = ref_predict(
                cr1, my * 8, mx * 8, 8, 8, cdy, cdx
            )
    return tuple(p.astype(np.uint8) for p in (y2, cb2, cr2))


def offset_frame(f, seed, span=20):
    """f plus a per-8x8-block constant offset in [-span, span] — keeps
    blocks constant (exact intra/residual coding) and residual levels
    inside the +-255 quantized range."""
    rng = np.random.RandomState(seed)
    out = []
    for p in f:
        h, w = p.shape
        d = rng.randint(-span, span + 1, size=(h // 8, w // 8))
        d = np.repeat(np.repeat(d, 8, axis=0), 8, axis=1)
        out.append(np.clip(p.astype(np.int64) + d, 0, 255).astype(np.uint8))
    return tuple(out)


def assert_frames_equal(got, want, what):
    for gi, wi, name in zip(got, want, "Y Cb Cr".split()):
        assert np.array_equal(gi, wi), f"{what}: {name} plane differs"


# ---- table structure ---------------------------------------------------------
def kraft(codes):
    return sum(2.0 ** -len(c) for c in codes)


@pytest.mark.parametrize(
    "table,extra",
    [
        (M.MBA_CODES, [M.MBA_ESCAPE, M.MBA_STUFFING]),
        (M.MBTYPE_I, []),
        (M.MBTYPE_P, []),
        (M.MBTYPE_B, []),
        (M.MOTION_CODES, []),
        (M.DC_SIZE_LUMA, []),
        (M.DC_SIZE_CHROMA, []),
        (M.DCT_CODES, [M.DCT_EOB, M.DCT_ESCAPE]),
    ],
)
def test_tables_prefix_free_and_kraft(table, extra):
    vals = list(table.values())
    codes = (
        vals if all(isinstance(v, str) for v in vals) else list(table.keys())
    ) + extra
    # prefix-free
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                assert not b.startswith(a), (a, b)
    assert kraft(codes) <= 1.0 + 1e-12


# ---- unit round-trips ---------------------------------------------------------
def test_dc_differential_roundtrip():
    for luma in (True, False):
        for diff in list(range(-255, 256, 17)) + [-255, -1, 0, 1, 255]:
            w = M._BitWriter()
            M._write_dc(w, diff, luma)
            w.bits(1, 1)  # guard bit
            r = M._BitReader(w.bytes_out())
            assert M._read_dc(r, luma) == diff, (luma, diff)


def test_run_level_roundtrip_vlc_and_escape():
    cases = [
        (0, 1), (0, -1), (0, 2), (0, 4), (1, 1), (7, -1), (2, 1),
        (0, 5), (3, 2), (20, 1), (0, 40), (5, -200), (0, 200), (63, -255),
    ]
    for first in (True, False):
        for run, level in cases:
            w = M._BitWriter()
            M._write_run_level(w, run, level, first)
            w.bits(1, 1)
            r = M._BitReader(w.bytes_out())
            got = M._read_run_level(r, first)
            assert got == (run, level), (first, run, level, got)


def test_motion_code_roundtrip_with_prediction_and_wrap():
    w = M._BitWriter()
    penc = M._MvPredictor()
    # successive differentials must stay in the implemented |code| <= 7
    wants = [(0, 0), (3, -4), (7, 2), (2, 6), (-4, 1)]
    for dy, dx in wants:
        M._code_mv(w, penc, dy, dx)
    w.bits(1, 1)
    r = M._BitReader(w.bytes_out())
    pdec = M._MvPredictor()
    for dy, dx in wants:
        assert M._read_mv(r, pdec) == (dy, dx)


def test_mba_escape_roundtrip():
    w = M._BitWriter()
    inc = 40  # needs one escape
    rem = inc
    while rem > 33:
        w.code(M.MBA_ESCAPE)
        rem -= 33
    w.code(M.MBA_CODES[rem])
    w.bits(1, 1)
    r = M._BitReader(w.bytes_out())
    total = 0
    val = M._read_vlc(r, M._TRIE_MBA, "mba")
    while val == "escape":
        total += 33
        val = M._read_vlc(r, M._TRIE_MBA, "mba")
    assert total + val == 40


# ---- frame-level exactness ------------------------------------------------
def test_intra_only_exact():
    frames = [block_constant_frame(48, 64, s) for s in (1, 2)]
    payload = M.encode_mpeg1(frames, pattern="II")
    assert M.is_mpeg1(payload)
    out, (w, h, fps) = M.decode_mpeg1(payload)
    assert (w, h) == (64, 48) and fps == 25.0
    assert len(out) == 2
    for got, want, i in zip(out, frames, range(2)):
        assert_frames_equal(got, want, f"I frame {i}")


@pytest.mark.parametrize("dy,dx", [(0, 0), (0, 4), (-4, 2), (0, 1), (1, 1), (3, -3)])
def test_p_motion_compensation_exact(dy, dx):
    """Interior MBs move by (dy, dx) half-pels (incl. half-pel averaging
    paths); border MBs are zero-vector copies. Residual is zero by
    construction, so decode must be bit-exact."""
    f1 = block_constant_frame(48, 80, 3)
    # non-block-aligned luma detail so half-pel MC actually averages
    # different values; intra coding of it is lossy, so the moved frame
    # is built from the DECODED reference (what the encoder predicts
    # from) — residual is then exactly zero
    y = f1[0].astype(np.int64)
    y[8:40, 8:72] += np.arange(64)[None, :] % 7
    f1 = (np.clip(y, 0, 255).astype(np.uint8), f1[1], f1[2])
    ref = M.decode_mpeg1(M.encode_mpeg1([f1], pattern="I"))[0][0]
    f2 = shifted_interior(ref, dy, dx)
    payload = M.encode_mpeg1([f1, f2], pattern="IP", mv_hints=[None, (dy, dx)])
    out, _ = M.decode_mpeg1(payload)
    assert_frames_equal(out[0], ref, "ref")
    assert_frames_equal(out[1], f2, f"P mv=({dy},{dx})")


def test_p_skip_run_exact_and_compact():
    f1 = block_constant_frame(48, 64, 4)
    payload = M.encode_mpeg1([f1, f1], pattern="IP")
    out, _ = M.decode_mpeg1(payload)
    assert_frames_equal(out[1], f1, "static P")
    # the static P picture should be tiny vs the I picture (skips +
    # zero-vector copies, no coefficients)
    i_only = M.encode_mpeg1([f1], pattern="I")
    assert len(payload) < len(i_only) + len(i_only) // 4


def test_p_coded_residual_luma_only_exact():
    """Constant +4 luma change on every MB: non-intra reconstruction
    (qscale 2) is exact for constant residuals after rounding — the
    coded-block path (CBP=60) decodes bit-exact."""
    f1 = block_constant_frame(32, 48, 5)
    y2 = np.clip(f1[0].astype(np.int64) + 4, 0, 255).astype(np.uint8)
    f2 = (y2, f1[1], f1[2])
    payload = M.encode_mpeg1([f1, f2], pattern="IP", qscale=2)
    out, _ = M.decode_mpeg1(payload)
    assert_frames_equal(out[1], f2, "P coded residual")


def test_b_frame_modes_and_reordering():
    """I x P with B between: B MBs are exactly the interpolated average
    of the references (fwd/bwd candidates fail, interp succeeds).
    Output must come back in DISPLAY order."""
    fI = block_constant_frame(32, 48, 6)
    fP = offset_frame(fI, 7)
    fB = tuple(
        ((a.astype(np.int64) + b.astype(np.int64) + 1) >> 1).astype(np.uint8)
        for a, b in zip(fI, fP)
    )
    payload = M.encode_mpeg1([fI, fB, fP], pattern="IBP", qscale=2)
    out, _ = M.decode_mpeg1(payload)
    assert len(out) == 3
    assert_frames_equal(out[0], fI, "I")
    assert_frames_equal(out[2], fP, "P")
    assert_frames_equal(out[1], fB, "B interp")


def test_b_forward_and_backward_copies():
    fI = block_constant_frame(32, 48, 8)
    fP = offset_frame(fI, 9)
    for fB, tag in ((fI, "fwd copy"), (fP, "bwd copy")):
        payload = M.encode_mpeg1([fI, fB, fP], pattern="IBP", qscale=2)
        out, _ = M.decode_mpeg1(payload)
        assert_frames_equal(out[1], fB, tag)


def test_long_gop_chain_exact():
    """I P P P with per-frame motion — error would accumulate if any
    reference reconstruction drifted."""
    f = [block_constant_frame(48, 64, 10)]
    hints = [None]
    for k, (dy, dx) in enumerate([(0, 2), (2, 0), (-2, -2)]):
        f.append(shifted_interior(f[-1], dy, dx))
        hints.append((dy, dx))
    payload = M.encode_mpeg1(f, pattern="IPPP", mv_hints=hints)
    out, _ = M.decode_mpeg1(payload)
    for i, (got, want) in enumerate(zip(out, f)):
        assert_frames_equal(got, want, f"chain frame {i}")


def test_errors():
    with pytest.raises(ValueError):
        M.decode_mpeg1(b"\x00\x00\x01\xb7 nope")
    with pytest.raises(ValueError):
        M.encode_mpeg1(
            [block_constant_frame(32, 48, 1)] * 2, pattern="BP"
        )  # starts with B
    with pytest.raises(ValueError):
        M.encode_mpeg1(
            [block_constant_frame(30, 48, 1)]
        )  # not MB-aligned


def test_rgb_helpers_roundtrip_on_flat_colors():
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200
    rgb[:, :, 1] = 60
    rgb[:, :, 2] = 30
    y, cb, cr = M.rgb_to_ycbcr420(rgb)
    back = M.ycbcr420_to_rgb(y, cb, cr)
    assert np.all(np.abs(back.astype(int) - rgb.astype(int)) <= 2)


def test_spark_frame_sampling_mpeg1(spark):
    from markdown_lab_spark.functions.codecs import decode_png
    from markdown_lab_spark.functions.video import sample_video_frames

    frames = [block_constant_frame(32, 48, s) for s in range(30, 36)]
    payload = M.encode_mpeg1(frames, pattern="I" + "P" * 5, frame_rate_code=3)
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload)), (2, "video", bytearray(b"junk"))],
        "media_id long, kind string, payload binary",
    )
    rows = sample_video_frames(
        df, every_n_seconds=2 / 25.0, max_frames_per_video=10
    ).collect()
    assert {r["media_id"] for r in rows} == {1}
    assert [r["frame_index"] for r in rows] == [0, 2, 4]
    r0 = next(r for r in rows if r["frame_index"] == 0)
    assert (r0["width"], r0["height"]) == (48, 32)
    w, h, _c, px = decode_png(bytes(r0["frame_png"]))
    assert (w, h) == (48, 32)
    want = M.ycbcr420_to_rgb(*frames[0])
    assert np.array_equal(px, want)
