"""Progressive JPEG (SOF2): spectral selection + successive approximation.

The load-bearing property: a progressive encode of an image decodes to
EXACTLY the pixels of its baseline encode — the two streams carry
identical quantized coefficients through completely different entropy
organizations (DC/AC first scans, EOB runs, ZRL-in-refinement,
correction bits), so byte-level equality of the decoded pixel arrays
exercises every scan type end to end. Mirrors the behavior of T.81
Annex G as implemented by every conforming codec (reference has no
codecs at all — this is engine scale surface, web JPEGs are commonly
progressive).
"""

from __future__ import annotations

import numpy as np
import pytest

from markdown_lab_spark.functions import jpeg as J


def _rng():
    return np.random.default_rng(1234)


CASES = [
    ("gray-const", lambda r: np.full((16, 16), 130, np.uint8), False, 0),
    (
        "gray-grad",
        lambda r: (np.add.outer(np.arange(24), np.arange(40)) * 3 % 256).astype(
            np.uint8
        ),
        False,
        0,
    ),
    ("gray-noise", lambda r: r.integers(0, 256, (27, 35), dtype=np.uint8), False, 0),
    ("rgb-444", lambda r: r.integers(0, 256, (19, 22, 3), dtype=np.uint8), False, 0),
    ("rgb-420", lambda r: r.integers(0, 256, (33, 41, 3), dtype=np.uint8), True, 0),
    (
        "rgb-420-big",
        lambda r: r.integers(0, 256, (64, 80, 3), dtype=np.uint8),
        True,
        0,
    ),
    ("gray-rst", lambda r: r.integers(0, 256, (40, 56), dtype=np.uint8), False, 3),
    (
        "rgb-420-rst",
        lambda r: r.integers(0, 256, (48, 64, 3), dtype=np.uint8),
        True,
        2,
    ),
]


@pytest.mark.parametrize("name,make,sub,ri", CASES, ids=[c[0] for c in CASES])
def test_progressive_equals_baseline(name, make, sub, ri):
    arr = make(_rng()).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(arr, subsample=sub))
    prog = J.decode_jpeg(
        J.encode_jpeg_progressive(arr, subsample=sub, restart_interval=ri)
    )
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])


def test_progressive_stream_is_sof2_multi_scan():
    arr = _rng().integers(0, 256, (24, 24, 3), dtype=np.uint8)
    payload = J.encode_jpeg_progressive(arr)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    # the 3-component script emits 10 scans
    assert payload.count(b"\xff\xda") == 10


def test_ac_refinement_block_roundtrip_fuzz():
    """Block-level encoder/decoder duality for the hardest scan type
    (AC refinement): random sparse coefficient runs exercise EOB runs
    spanning blocks, ZRL with interleaved correction bits, and
    newly-significant placement."""
    ac_syms = sorted(
        {0xF0}
        | {(r << 4) | s for r in range(16) for s in range(1, 11)}
        | {r << 4 for r in range(15)}
    )
    bits, vals = J._flat_table(ac_syms)
    ac_codes = J._canonical_codes(bits, vals)
    huff_ac = {(c, l): s for s, (c, l) in ac_codes.items()}
    lut = J._lut_for(huff_ac)
    rng = np.random.default_rng(7)

    def tz(c, al):
        return (np.abs(c) >> al) * np.sign(c)

    for _trial in range(60):
        nblocks = int(rng.integers(1, 8))
        full = rng.integers(-6, 7, (nblocks, 64)).astype(np.int64)
        full[rng.random((nblocks, 64)) < float(rng.uniform(0.5, 0.98))] = 0
        w = J._ScanWriter(ac_codes)
        for b in range(nblocks):
            J._enc_ac_refine_block(w, full[b], 1, 63, 1)
        w.flush_eobrun()
        w.flush()
        data = bytes(w.buf) + b"\xff\xd9"
        # decode through the real scan machinery: fake a 1-component
        # frame whose non-interleaved grid is nblocks x 1
        frame = (8, 8 * nblocks, 1, [(1, 1, 1, 0)])
        coef = [np.zeros((nblocks, 1, 64), dtype=np.int64)]
        coef[0][:, 0, :] = tz(full, 2) << 2
        J._decode_progressive_scan(
            data, 0, frame, [(1, 0, 0)], {(1, 0): huff_ac}, 0, coef, 1, 63, 2, 1
        )
        exp = tz(full, 1) << 1
        exp[:, 0] = (tz(full, 2) << 2)[:, 0]  # DC untouched by AC scans
        assert np.array_equal(coef[0][:, 0, :], exp)


def test_progressive_truncation_and_header_validation():
    arr = _rng().integers(0, 256, (24, 24), dtype=np.uint8)
    payload = J.encode_jpeg_progressive(arr)
    # truncating inside a scan's entropy data -> clean ValueError
    with pytest.raises(ValueError):
        J.decode_jpeg(payload[: len(payload) * 2 // 3] + b"\xff\xd9")
    # corrupt scan header: give the first AC scan an interleaved look by
    # rewriting its band to straddle DC (Ss=0, Se=5)
    idx = payload.find(b"\xff\xda", payload.find(b"\xff\xda") + 2)
    bad = bytearray(payload)
    ns = bad[idx + 4]
    bad[idx + 5 + 2 * ns] = 0  # Ss -> 0 while Se stays nonzero
    with pytest.raises(ValueError, match="Se=0"):
        J.decode_jpeg(bytes(bad))


def test_multimodal_sniffer_decodes_progressive_payloads():
    from markdown_lab_spark.functions.multimodal import _decode_image_any

    arr = _rng().integers(0, 256, (20, 28, 3), dtype=np.uint8)
    base = _decode_image_any(J.encode_jpeg(arr), None)
    prog = _decode_image_any(J.encode_jpeg_progressive(arr), None)
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])
