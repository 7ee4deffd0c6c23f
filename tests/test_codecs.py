"""Pure-stdlib PNG/WAV codecs: the real-decode half of the multimodal
family (codecs.py). No reference decoder exists in this container, so
correctness rests on (a) cross-filter consistency — the same pixels
encoded under each of the five PNG spec filters must decode identically,
(b) filter-0 roundtrip being a trivial re-layering of the raw bytes, and
(c) analytic WAV fixtures (a sine wave's RMS and ZCR are known in
closed form)."""

import math

import numpy as np
import pytest

from markdown_lab_spark.functions import codecs


def _gradient(h, w, ch):
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    c = np.arange(ch, dtype=np.uint8)[None, None, :]
    return ((y * 7 + x * 3 + c * 31) % 256).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_filter0(channels):
    arr = _gradient(13, 17, channels)
    payload = codecs.encode_png(arr, filter_type=0)
    w, h, ch, px = codecs.decode_png(payload)
    assert (w, h, ch) == (17, 13, channels)
    assert np.array_equal(px, arr)


@pytest.mark.parametrize("filter_type", [1, 2, 3, 4])
def test_png_cross_filter_consistency(filter_type):
    """Encoding under Sub/Up/Average/Paeth must decode to the same pixels
    as the trivially-correct filter-0 path."""
    arr = _gradient(23, 31, 3)
    base = codecs.decode_png(codecs.encode_png(arr, filter_type=0))[3]
    via = codecs.decode_png(codecs.encode_png(arr, filter_type=filter_type))[3]
    assert np.array_equal(base, via)
    assert np.array_equal(via, arr)


def test_png_rejects_unsupported_and_garbage():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png at all")
    # 16-bit depth: patch the IHDR of a valid PNG
    payload = bytearray(codecs.encode_png(_gradient(4, 4, 3)))
    assert payload[24] == 8  # bit depth byte in IHDR
    payload[24] = 16
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(payload))


def test_png_image_features_deterministic():
    arr = np.zeros((10, 20, 3), dtype=np.uint8)
    arr[:, :, 0] = 255  # pure red
    feat = codecs.image_features_from_pixels(20, 10, 3, arr)
    assert feat[0] == 1.0 and feat[1] == 0.0 and feat[2] == 0.0
    assert feat[5] == 0.5  # aspect min(20/10, 10/20)
    assert feat[6] == round(1.0 / 3.0, 6)  # luma of pure red


def test_wav_roundtrip_and_analytic_features():
    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = (0.5 * 32767 * np.sin(2 * math.pi * 440 * t / rate)).astype(np.int16)
    payload = codecs.encode_wav(sine, rate)
    r, nch, samples = codecs.decode_wav(payload)
    assert (r, nch) == (rate, 1)
    assert np.array_equal(samples[:, 0], sine)
    f = codecs.audio_features(r, nch, samples)
    assert f["duration_s"] == 1.0
    # RMS of a half-amplitude sine = 0.5/sqrt(2) ~ 0.3536
    assert abs(f["rms"] - 0.5 / math.sqrt(2)) < 0.01
    # a 440 Hz sine crosses zero ~880 times/s -> zcr ~ 880/8000
    assert abs(f["zcr"] - 880 / rate) < 0.01


def test_spark_pipeline_real_png_and_wav(spark):
    """The mapInPandas pipelines route PNG/WAV payloads through the real
    decoders (width/height from IHDR, duration from the WAV header) and
    everything else through the stub."""
    from markdown_lab_spark.functions.multimodal import (
        extract_audio_features,
        extract_image_features,
    )

    png = codecs.encode_png(_gradient(12, 34, 3))
    rate = 4000
    sine = (
        0.25 * 32767 * np.sin(2 * math.pi * 100 * np.arange(2 * rate) / rate)
    ).astype(np.int16)
    wav = codecs.encode_wav(sine, rate)
    rows = [
        (1, "image", bytearray(png), "image/png", {}),
        (2, "image", bytearray(b"\xff\xd8fakejpeg"), "image/jpeg", {}),
        (3, "audio", bytearray(wav), "audio/wav", {}),
        (4, "audio", bytearray(b"ID3fakempeg"), "audio/mpeg", {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    img = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert (img[1]["width"], img[1]["height"]) == (34, 12)  # real IHDR
    assert img[2]["width"] != 34 or img[2]["height"] != 12  # stub path
    aud = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert aud[3]["sample_rate"] == rate
    assert aud[3]["duration_s"] == 2.0
    assert aud[4]["sample_rate"] is None


def test_spark_pipeline_survives_adversarial_payloads(spark):
    """Round-3 ADVICE: malformed web media used to leak struct.error /
    zlib.error / wave.Error / IndexError out of the decoders and abort
    the whole Spark job. The decoder boundary now normalizes everything
    to ValueError, so every adversarial row falls back to the stub (or a
    null-feature row for audio) instead of killing the task."""
    import struct as _struct

    from markdown_lab_spark.functions.multimodal import (
        extract_audio_features,
        extract_image_features,
        resize_images,
    )

    good_png = codecs.encode_png(_gradient(8, 8, 3))
    trunc_ihdr = codecs.PNG_MAGIC + _struct.pack(">I", 13) + b"IHDR" + b"\x00" * 3
    corrupt_idat = good_png[:40] + b"\x00" * 8 + good_png[48:]
    # RIFF/WAVE magic but garbage body -> wave.Error before the fix
    bad_wav = b"RIFF" + b"\x10\x00\x00\x00" + b"WAVEjunkjunkjunk"
    trunc_gif = b"GIF89a" + b"\x08"
    trunc_jpeg = b"\xff\xd8\xff\xc0\x00\x05\x08"
    rows = [
        (1, "image", bytearray(good_png), "image/png", {}),
        (2, "image", bytearray(trunc_ihdr), "image/png", {}),
        (3, "image", bytearray(corrupt_idat), "image/png", {}),
        (4, "image", bytearray(trunc_gif), "image/gif", {}),
        (5, "image", bytearray(trunc_jpeg), "image/jpeg", {}),
        (6, "audio", bytearray(bad_wav), "audio/wav", {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    img = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert len(img) == 5  # no row lost, no job abort
    assert (img[1]["width"], img[1]["height"]) == (8, 8)  # real decode
    aud = extract_audio_features(df).collect()
    assert len(aud) == 1 and aud[0]["sample_rate"] is None
    # resize drops undecodable payloads by contract — the point is the
    # job survives and the one good payload comes through resized
    rs = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert set(rs) == {1} and (rs[1]["width"], rs[1]["height"]) == (4, 4)


# ---------------------------------------------------------------------------
# baseline JPEG (functions/jpeg.py)
# ---------------------------------------------------------------------------


def _closed_form_const(v):
    """Decoded value of a constant-v 8x8 gray block (Annex-K q00=16,
    half-up rounding both sides)."""
    return max(0, min(255, 2 * math.floor((v - 128) / 2 + 0.5) + 128))


def test_jpeg_constant_blocks_exact():
    from markdown_lab_spark.functions import jpeg

    for v in [0, 1, 7, 77, 128, 200, 254, 255]:
        arr = np.full((16, 24), v, dtype=np.uint8)
        w, h, ch, px = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
        assert (w, h, ch) == (24, 16, 1)
        assert np.unique(px).tolist() == [_closed_form_const(v)]


def test_jpeg_rgb_roundtrip_bounded_error():
    from markdown_lab_spark.functions import jpeg

    y, x = np.mgrid[0:40, 0:56]
    rgb = np.stack(
        [(x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)
    for sub in (False, True):
        w, h, ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, subsample=sub))
        assert (w, h, ch) == (56, 40, 3)
        err = np.abs(out.astype(int) - rgb.astype(int)).max()
        assert err <= (16 if sub else 10), (sub, err)


def test_jpeg_non_multiple_of_8_dims():
    """Edge-padded encode + decode crop restore the exact declared dims."""
    from markdown_lab_spark.functions import jpeg

    arr = _gradient(13, 19, 3)[:, :, :3]
    for sub in (False, True):
        w, h, ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, subsample=sub))
        assert (w, h, ch) == (19, 13, 3)
        assert out.shape == (13, 19, 3)


def test_jpeg_tolerates_fill_bytes_between_segments():
    """T.81 B.1.1.2 allows any number of 0xFF pad bytes before a marker;
    real encoders emit them, so they must not be read as markers
    (round-3 ADVICE)."""
    from markdown_lab_spark.functions import jpeg

    arr = (np.arange(16 * 16 * 3).reshape(16, 16, 3) % 256).astype(np.uint8)
    enc = jpeg.encode_jpeg(arr)
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    assert jpeg.decode_jpeg(padded)[:3] == jpeg.decode_jpeg(enc)[:3]
    w, h, _c, px = jpeg.decode_jpeg(padded)
    _w2, _h2, _c2, px2 = jpeg.decode_jpeg(enc)
    assert (px == px2).all()


def test_jpeg_rejects_garbage_and_invalid_progressive_header():
    from markdown_lab_spark.functions import jpeg

    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"definitely not a jpeg")
    # a baseline stream relabeled SOF2 carries an Ss=0/Se=63 scan header,
    # which the progressive scan-header validation must reject (T.81
    # G.1.1.1.1: a DC scan has Se=0) — progressive itself now decodes
    payload = bytearray(jpeg.encode_jpeg(np.full((8, 8), 5, dtype=np.uint8)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="Se=0"):
        jpeg.decode_jpeg(bytes(payload))


def test_jpeg_grayscale_smooth_close():
    """A genuinely smooth image (no wrap discontinuities) stays within a
    tight error bound — the quant tables' low-frequency steps are small."""
    from markdown_lab_spark.functions import jpeg

    y, x = np.mgrid[0:32, 0:32]
    arr = (96 + 0.8 * x + 0.5 * y).astype(np.uint8)
    _w, _h, _ch, out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
    assert np.abs(out[:, :, 0].astype(int) - arr.astype(int)).max() <= 6


def test_spark_pipeline_real_jpeg(spark):
    """JPEG payloads are magic-sniffed into the real decoder: width and
    height come from the SOF0 header, not the stub's md5 fake."""
    from markdown_lab_spark.functions import jpeg
    from markdown_lab_spark.functions.multimodal import extract_image_features

    payload = jpeg.encode_jpeg(_gradient(24, 40, 3), subsample=True)
    df = spark.createDataFrame(
        [(9, "image", bytearray(payload), "image/jpeg", {})],
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    row = extract_image_features(df).collect()[0]
    assert (row["width"], row["height"]) == (40, 24)


def test_resize_nearest_exact_and_pipeline(spark):
    """resize_nearest uses src = floor(dst*src/dst): exact on a gradient;
    the Spark operator re-encodes to PNG with correct declared dims."""
    from markdown_lab_spark.functions.multimodal import resize_images

    arr = _gradient(20, 30, 3)
    small = codecs.resize_nearest(arr, 6, 5)
    for y in range(5):
        for x in range(6):
            assert (small[y, x] == arr[(y * 20) // 5, (x * 30) // 6]).all()

    df = spark.createDataFrame(
        [
            (1, "image", bytearray(codecs.encode_png(arr)), "image/png", {}),
            (2, "image", bytearray(b"junk not an image"), "x", {}),
        ],
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    rows = resize_images(df, out_w=6, out_h=5).collect()
    assert len(rows) == 1  # undecodable payload dropped
    w, h, ch, px = codecs.decode_png(bytes(rows[0]["payload"]))
    assert (w, h) == (6, 5)
    assert np.array_equal(px, small)


# ---------------------------------------------------------------------------
# GIF (codecs.py LZW)
# ---------------------------------------------------------------------------


def _gif_palette():
    i = np.arange(256)
    return np.stack([(i * 5) % 256, (i * 7) % 256, (i * 11) % 256], axis=1).astype(
        np.uint8
    )


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(interlace):
    pal = _gif_palette()
    idx = ((np.arange(37)[:, None] * 7 + np.arange(53)[None, :] * 3) % 256).astype(
        np.uint8
    )
    w, h, ch, rgb = codecs.decode_gif(codecs.encode_gif(idx, pal, interlace=interlace))
    assert (w, h, ch) == (53, 37, 3)
    assert np.array_equal(rgb, pal[idx])


def test_gif_lzw_dict_reset_roundtrip():
    """A large random-index image forces the LZW dictionary past 4096
    entries, exercising the CLEAR-code reset path on both sides."""
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 256, (200, 300)).astype(np.uint8)
    pal = _gif_palette()
    _w, _h, _c, rgb = codecs.decode_gif(codecs.encode_gif(idx, pal))
    assert np.array_equal(rgb, pal[idx])


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_gif(b"GIFXX not really")
    with pytest.raises(ValueError):
        codecs.decode_gif(b"plainly not a gif")


def test_spark_pipeline_real_gif(spark):
    from markdown_lab_spark.functions.multimodal import extract_image_features

    pal = _gif_palette()
    idx = ((np.arange(21)[:, None] + np.arange(33)[None, :]) % 256).astype(np.uint8)
    payload = codecs.encode_gif(idx, pal, interlace=True)
    df = spark.createDataFrame(
        [(11, "image", bytearray(payload), "image/gif", {})],
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    row = extract_image_features(df).collect()[0]
    assert (row["width"], row["height"]) == (33, 21)


def test_native_codec_seam_accepts_injected_backend(spark):
    """The native-codec seam (round-3 verdict item 7): both image
    pipelines take an injected ``payload -> (w,h,c,pixels)`` backend and
    run it AHEAD of the pure decoders. Proven with a fake backend that
    (a) claims a sentinel size for a magic-tagged payload, (b) raises
    ValueError for everything else (falling through to the pure path)."""
    from markdown_lab_spark.functions.multimodal import (
        extract_image_features,
        resize_images,
    )

    sentinel = b"NATIVE-ONLY-FORMAT" + b"\x00" * 16

    def fake_backend(payload: bytes):
        if payload.startswith(b"NATIVE-ONLY-FORMAT"):
            return 7, 5, 3, np.full((5, 7, 3), 200, dtype=np.uint8)
        raise ValueError("not mine")

    png = codecs.encode_png(_gradient(8, 8, 3))
    rows = [
        (1, "image", bytearray(sentinel), "image/x-native", {}),
        (2, "image", bytearray(png), "image/png", {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    feats = {
        r["media_id"]: r
        for r in extract_image_features(df, image_decoder=fake_backend).collect()
    }
    assert (feats[1]["width"], feats[1]["height"]) == (7, 5)  # backend decoded
    assert (feats[2]["width"], feats[2]["height"]) == (8, 8)  # pure fallback
    rs = {
        r["media_id"]: r
        for r in resize_images(df, 4, 4, image_decoder=fake_backend).collect()
    }
    assert set(rs) == {1, 2}  # backend-only payload is now resizable too
    assert all((r["width"], r["height"]) == (4, 4) for r in rs.values())


def test_native_backend_crosschecks_pure_decoders_when_present():
    """When a real native library (PIL) exists in the environment, the
    loader must return a working backend whose output matches the
    pure-numpy oracle byte-for-byte on lossless formats. Skipped (with
    the loader asserted None-safe) when no native lib is installed."""
    from markdown_lab_spark.functions.multimodal import native_image_backend

    backend = native_image_backend()
    if backend is None:
        pytest.skip("no native image library in this environment")
    arr = _gradient(12, 9, 3)
    png = codecs.encode_png(arr)
    w, h, c, px = backend(png)
    assert (w, h, c) == (12, 9, 3)
    assert (px == arr).all()  # PNG is lossless: native == oracle exactly
    # progressive JPEG: our encode must be decodable by the native lib,
    # and the native pixels must match the pure decoder's exactly (same
    # coefficients -> same IDCT input; PIL's IDCT is integer-exact on
    # block-constant images, so use one)
    from markdown_lab_spark.functions import jpeg

    const = np.full((16, 16), 130, dtype=np.uint8)
    prog = jpeg.encode_jpeg_progressive(const)
    wj, hj, cj, pxj = backend(prog)
    assert (wj, hj) == (16, 16)
    assert (pxj.reshape(16, 16, -1)[:, :, 0] == jpeg.decode_jpeg(prog)[3][:, :, 0]).all()
    with pytest.raises(ValueError):
        backend(b"not an image at all")


def test_jpeg_restart_markers_roundtrip_identical():
    """DRI + RSTn streams (T.81 B.2.4.4) decode through the legacy
    byte-aligned reader and must produce pixels identical to the
    restart-free encoding of the same image (DC prediction resets at
    each marker on both sides)."""
    from markdown_lab_spark.functions import jpeg

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    rst = jpeg.encode_jpeg(arr, restart_interval=2)
    assert b"\xff\xdd" in rst  # DRI present
    assert b"\xff\xd0" in rst  # at least one RST0
    assert (jpeg.decode_jpeg(rst)[3] == jpeg.decode_jpeg(jpeg.encode_jpeg(arr))[3]).all()
    g = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    assert (
        jpeg.decode_jpeg(jpeg.encode_jpeg(g, restart_interval=1))[3]
        == jpeg.decode_jpeg(jpeg.encode_jpeg(g))[3]
    ).all()
    sub = jpeg.encode_jpeg(arr, subsample=True, restart_interval=3)
    assert (
        jpeg.decode_jpeg(sub)[3]
        == jpeg.decode_jpeg(jpeg.encode_jpeg(arr, subsample=True))[3]
    ).all()


def test_jpeg_fast_and_legacy_readers_agree():
    """The LUT fast path and the per-bit legacy path must decode the
    same restart-free stream bit-identically."""
    import markdown_lab_spark.functions.jpeg as J

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    enc = J.encode_jpeg(arr)
    fast = J.decode_jpeg(enc)
    orig = J._decode_scan

    def legacy_scan(data, pos, frame, scan, quant, huff, restart_interval,
                    **kw):
        return orig(data, pos, frame, scan, quant, huff, restart_interval,
                    _force_legacy=True, **kw)

    J._decode_scan = legacy_scan
    try:
        slow = J.decode_jpeg(enc)
    finally:
        J._decode_scan = orig
    assert fast[:3] == slow[:3] and (fast[3] == slow[3]).all()


def test_jpeg_fast_reader_handles_restart_streams():
    """Round-4 verdict q48 item: restart-marker streams now route
    through the LUT fast path (sync_to_rst drops only the padding bits)
    and must agree bit-identically with the per-bit legacy reader on
    the SAME DRI+RSTn stream, across intervals, grayscale, and
    subsampled layouts."""
    import markdown_lab_spark.functions.jpeg as J

    rng = np.random.default_rng(13)
    orig = J._decode_scan

    def legacy_scan(data, pos, frame, scan, quant, huff, restart_interval,
                    **kw):
        return orig(data, pos, frame, scan, quant, huff, restart_interval,
                    _force_legacy=True, **kw)

    cases = [
        J.encode_jpeg(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),
                      restart_interval=2),
        J.encode_jpeg(rng.integers(0, 256, (40, 40), dtype=np.uint8),
                      restart_interval=1),
        J.encode_jpeg(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),
                      subsample=True, restart_interval=3),
    ]
    for enc in cases:
        assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
        fast = J.decode_jpeg(enc)
        J._decode_scan = legacy_scan
        try:
            slow = J.decode_jpeg(enc)
        finally:
            J._decode_scan = orig
        assert fast[:3] == slow[:3] and (fast[3] == slow[3]).all()


def test_native_audio_seam_accepts_injected_backend(spark):
    """Round-4 verdict item 5 (fallback leg): the audio pipeline takes an
    injected ``payload -> (rate, nch, samples)`` backend ahead of the
    pure stdlib-wave decoder — proven with a fake backend that decodes a
    sentinel native-only payload and ValueErrors everything else (WAV
    then falls through to the pure path)."""
    from markdown_lab_spark.functions.multimodal import extract_audio_features

    sentinel = b"NATIVE-ONLY-AUDIO" + b"\x00" * 16

    def fake_backend(payload: bytes):
        if payload.startswith(b"NATIVE-ONLY-AUDIO"):
            # 1 second of a 100 Hz-ish square-ish signal at 8 kHz mono
            s = (np.arange(8000) % 80 < 40).astype(np.int16) * 1000 - 500
            return 8000, 1, s[:, None]
        raise ValueError("not mine")

    wav = codecs.encode_wav(
        (np.arange(4000, dtype=np.int16) % 321 - 160)[:, None], 16000
    )
    rows = [
        (1, "audio", bytearray(sentinel), "audio/x-native", {}),
        (2, "audio", bytearray(wav), "audio/wav", {}),
        (3, "audio", bytearray(b"garbage"), "audio/x-broken", {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "meta map<string,string>",
    )
    feats = {
        r["media_id"]: r
        for r in extract_audio_features(df, audio_decoder=fake_backend).collect()
    }
    assert feats[1]["sample_rate"] == 8000 and feats[1]["n_samples"] == 8000
    assert feats[1]["duration_s"] == pytest.approx(1.0)
    assert feats[2]["sample_rate"] == 16000 and feats[2]["n_samples"] == 4000
    assert feats[3]["sample_rate"] is None  # undecodable -> null features
    # pure-path parity: the injected backend must not perturb WAV results
    pure = {
        r["media_id"]: r for r in extract_audio_features(df).collect()
    }
    for k in ("sample_rate", "n_channels", "n_samples", "rms", "zcr"):
        assert feats[2][k] == pure[2][k]


def test_native_audio_backend_crosschecks_pure_decoder_when_present():
    """When a real native audio library (soundfile/libsndfile) exists,
    the loader must return a backend whose PCM-WAV output matches the
    stdlib-wave oracle sample-for-sample. Skipped (loader asserted
    None-safe) when absent — this environment forbids installs."""
    from markdown_lab_spark.functions.multimodal import native_audio_backend

    backend = native_audio_backend()
    if backend is None:
        pytest.skip("no native audio library in this environment")
    samples = (np.arange(2000, dtype=np.int16) % 501 - 250)[:, None]
    wav = codecs.encode_wav(samples, 8000)
    rate, nch, got = backend(wav)
    assert (rate, nch) == (8000, 1)
    assert (got == samples).all()
    with pytest.raises(ValueError):
        backend(b"definitely not audio")
