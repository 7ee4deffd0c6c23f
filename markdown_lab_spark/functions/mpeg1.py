"""MPEG-1 video (ISO/IEC 11172-2) — inter-frame decode/encode: the
motion-compensation machinery the intra-only codecs (MJPEG/raw AVI)
could not exercise.

What is REAL here — the full inter-frame pipeline:
- sequence / GOP / picture / slice / macroblock syntax with start-code
  resync and byte stuffing;
- I, P and B pictures: forward, backward and interpolated prediction,
  half-pel motion compensation (the spec's rounding averages), motion
  vector prediction with the modulo-range wraparound, skipped-MB
  semantics (P: zero-vector copy; B: repeat previous mode/vectors);
- intra DC prediction (per-component, slice/intra resets), the default
  intra quantizer matrix + flat non-intra matrix, the normative
  reconstruction arithmetic including mismatch-control oddification
  and [-2048, 2047] clamping;
- decode-order → display-order reordering (B frames emit immediately,
  references emit when the next reference lands);
- an encoder twin that makes real decisions per macroblock (candidate
  vectors → zero-residual MC, coded residual, intra fallback; skip
  runs where legal) so fixtures exercise every path.

Honesty note (the arithmetic-JPEG posture): the VLC tables are
transcribed from the public spec; no reference MPEG-1 decoder exists
in this environment to cross-check bitstream interop, so the coder
pair is mirrored and self-consistent, with prefix-freeness and
Kraft-sum structure pinned by tests. The DCT-coefficient table
implements the high-frequency-of-use subset
{(0,1),(0,2),(0,3),(0,4),(1,1),(1,2),(2,1),(3,1),(4,1),(5,1),(6,1),
(7,1)} plus the full ESCAPE path (6-bit run + 8/16-bit level), which
can represent EVERY coefficient — the encoder uses ESCAPE for pairs
outside the subset (syntactically valid MPEG-1), and the decoder
accepts both. The coded-block-pattern table implements the
encoder-reachable {60 (luma only), 63 (all blocks)}; motion codes
cover |code| <= 7 (f_code=1). Values outside these subsets raise
ValueError at the decoder boundary rather than mis-decode.

Reference behavior mapped: none — the reference engine has no video
path at all; this extends the multimodal column story
(`functions/video.py`) to inter-frame codecs at the 100 TB posture.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .jpeg import _C, ZIGZAG

# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

DEFAULT_INTRA_Q = np.array(
    [
        [8, 16, 19, 22, 26, 27, 29, 34],
        [16, 16, 22, 24, 27, 29, 34, 37],
        [19, 22, 26, 27, 29, 34, 34, 38],
        [22, 22, 26, 27, 29, 34, 37, 40],
        [22, 26, 27, 29, 32, 35, 40, 48],
        [26, 27, 29, 32, 35, 40, 48, 58],
        [26, 27, 29, 34, 38, 46, 56, 69],
        [27, 29, 35, 38, 46, 56, 69, 83],
    ],
    dtype=np.int64,
)
DEFAULT_NONINTRA_Q = np.full((8, 8), 16, dtype=np.int64)

# macroblock_address_increment (Table B.1); the H.261-lineage table
MBA_CODES: Dict[int, str] = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010",
    6: "00011", 7: "00010", 8: "0000111", 9: "0000110",
    10: "00001011", 11: "00001010", 12: "00001001", 13: "00001000",
    14: "00000111", 15: "00000110",
    16: "0000010111", 17: "0000010110", 18: "0000010101",
    19: "0000010100", 20: "0000010011", 21: "0000010010",
    22: "00000100011", 23: "00000100010", 24: "00000100001",
    25: "00000100000", 26: "00000011111", 27: "00000011110",
    28: "00000011101", 29: "00000011100", 30: "00000011011",
    31: "00000011010", 32: "00000011001", 33: "00000011000",
}
MBA_ESCAPE = "00000001000"   # +33, then another increment code
MBA_STUFFING = "00000001111"

# macroblock_type, I pictures (Table B.2a): (quant, mc_f, mc_b, coded, intra)
MBTYPE_I: Dict[str, tuple] = {
    "1": (0, 0, 0, 0, 1),
    "01": (1, 0, 0, 0, 1),
}
# P pictures (Table B.2b)
MBTYPE_P: Dict[str, tuple] = {
    "1": (0, 1, 0, 1, 0),       # MC, coded
    "01": (0, 0, 0, 1, 0),      # no MC, coded
    "001": (0, 1, 0, 0, 0),     # MC, not coded
    "00011": (0, 0, 0, 0, 1),   # intra
    "00010": (1, 1, 0, 1, 0),   # quant, MC, coded
    "00001": (1, 0, 0, 1, 0),   # quant, no MC, coded
    "000001": (1, 0, 0, 0, 1),  # quant, intra
}
# B pictures (Table B.2c): (quant, mc_fwd, mc_bwd, coded, intra)
MBTYPE_B: Dict[str, tuple] = {
    "10": (0, 1, 1, 0, 0),      # interp, not coded
    "11": (0, 1, 1, 1, 0),      # interp, coded
    "010": (0, 0, 1, 0, 0),     # bwd, not coded
    "011": (0, 0, 1, 1, 0),     # bwd, coded
    "0010": (0, 1, 0, 0, 0),    # fwd, not coded
    "0011": (0, 1, 0, 1, 0),    # fwd, coded
    "00011": (0, 0, 0, 0, 1),   # intra
    "00010": (1, 1, 1, 1, 0),   # quant, interp, coded
    "000011": (1, 1, 0, 1, 0),  # quant, fwd, coded
    "000010": (1, 0, 1, 1, 0),  # quant, bwd, coded
    "000001": (1, 0, 0, 0, 1),  # quant, intra
}

# motion_code (Table B.4), implemented subset |code| <= 7; sign is the
# final bit of the codeword (0 positive)
_MOTION_BASE = {
    1: "01", 2: "001", 3: "0001", 4: "000011",
    5: "0000101", 6: "0000100", 7: "0000011",
}
MOTION_CODES: Dict[int, str] = {0: "1"}
for _v, _c in _MOTION_BASE.items():
    MOTION_CODES[_v] = _c + "0"
    MOTION_CODES[-_v] = _c + "1"

# coded_block_pattern (Table B.3), encoder-reachable subset
CBP_CODES: Dict[int, str] = {60: "111", 63: "001100"}

# dct_dc_size (Tables B.5a/B.5b)
DC_SIZE_LUMA: Dict[int, str] = {
    0: "100", 1: "00", 2: "01", 3: "101", 4: "110",
    5: "1110", 6: "11110", 7: "111110", 8: "1111110",
}
DC_SIZE_CHROMA: Dict[int, str] = {
    0: "00", 1: "01", 2: "10", 3: "110", 4: "1110",
    5: "11110", 6: "111110", 7: "1111110", 8: "11111110",
}

# dct coefficients (Table B.5c/d), implemented subset: (run, level) ->
# code WITHOUT the sign bit. (0,1) differs between the first
# coefficient of a non-intra block ('1') and any later position
# ('11', because EOB is '10').
DCT_EOB = "10"
DCT_ESCAPE = "000001"
DCT_CODES: Dict[Tuple[int, int], str] = {
    (0, 1): "11",  # dct_coeff_next form; first-coeff form handled inline
    (0, 2): "0100",
    (0, 3): "00101",
    (0, 4): "0000110",
    (1, 1): "011",
    (1, 2): "000110",
    (2, 1): "0101",
    (3, 1): "00111",
    (4, 1): "00110",
    (5, 1): "000111",
    (6, 1): "000101",
    (7, 1): "000100",
}

SEQ_START = b"\x00\x00\x01\xb3"
GOP_START = b"\x00\x00\x01\xb8"
PIC_START = b"\x00\x00\x01\x00"
SEQ_END = b"\x00\x00\x01\xb7"

FRAME_RATES = {1: 24000 / 1001, 2: 24.0, 3: 25.0, 4: 30000 / 1001,
               5: 30.0, 6: 50.0, 7: 60000 / 1001, 8: 60.0}


def is_mpeg1(payload: bytes) -> bool:
    return payload[:4] == SEQ_START


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def code(self, s: str) -> None:
        for ch in s:
            self.bits(1 if ch == "1" else 0, 1)

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)

    def start_code(self, sc: bytes) -> None:
        self.align()
        self.buf.extend(sc)

    def bytes_out(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits  # absolute bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, width: int) -> int:
        v = 0
        for _ in range(width):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _build_decode_trie(codes: Dict) -> dict:
    trie: dict = {}
    for val, code in codes.items():
        node = trie
        for ch in code[:-1]:
            node = node.setdefault(ch, {})
        if code[-1] in node and isinstance(node[code[-1]], dict):
            raise ValueError(f"non-prefix-free table at {code}")
        node[code[-1]] = ("leaf", val)
    return trie


def _read_vlc(r: _BitReader, trie: dict, what: str):
    node = trie
    for _ in range(24):
        b = "1" if r.bit() else "0"
        nxt = node.get(b)
        if nxt is None:
            raise ValueError(f"invalid {what} VLC")
        if isinstance(nxt, tuple):
            return nxt[1]
        node = nxt
    raise ValueError(f"runaway {what} VLC")


_TRIE_MBA = _build_decode_trie(
    {**MBA_CODES, "escape": MBA_ESCAPE, "stuffing": MBA_STUFFING}
)
# the MBTYPE tables read code -> flags; the trie builder wants
# value -> code, so invert (flag tuples are unique per table)
_TRIE_MBTYPE_I = _build_decode_trie({v: k for k, v in MBTYPE_I.items()})
_TRIE_MBTYPE_P = _build_decode_trie({v: k for k, v in MBTYPE_P.items()})
_TRIE_MBTYPE_B = _build_decode_trie({v: k for k, v in MBTYPE_B.items()})
_TRIE_MOTION = _build_decode_trie(MOTION_CODES)
_TRIE_CBP = _build_decode_trie(CBP_CODES)
_TRIE_DC_L = _build_decode_trie(DC_SIZE_LUMA)
_TRIE_DC_C = _build_decode_trie(DC_SIZE_CHROMA)
_TRIE_DCT = _build_decode_trie(
    {**DCT_CODES, "eob": DCT_EOB, "escape": DCT_ESCAPE}
)


# ---------------------------------------------------------------------------
# DCT + quantization (normative reconstruction)
# ---------------------------------------------------------------------------


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block.astype(np.float64) @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef.astype(np.float64) @ _C


def _oddify(v: np.ndarray) -> np.ndarray:
    """Mismatch control: non-zero even reconstruction levels step one
    toward zero (11172-2 2.4.4.2/2.4.4.3)."""
    even = (v != 0) & (v % 2 == 0)
    return v - even * np.sign(v)


def _recon_intra(qf: np.ndarray, qscale: int, w: np.ndarray) -> np.ndarray:
    rec = (2 * qf.astype(np.int64) * qscale * w) // 16
    rec = _oddify(rec)
    rec[0, 0] = qf[0, 0] * 8  # DC: step 8, no oddification
    return np.clip(rec, -2048, 2047)


def _recon_nonintra(qf: np.ndarray, qscale: int, w: np.ndarray) -> np.ndarray:
    s = np.sign(qf).astype(np.int64)
    rec = ((2 * qf.astype(np.int64) + s) * qscale * w) // 16
    # "//" on negatives rounds toward -inf; the spec divides with
    # truncation toward zero
    neg = (2 * qf + s) * qscale * w < 0
    rec = np.where(neg, -(((-(2 * qf.astype(np.int64) + s)) * qscale * w) // 16), rec)
    rec = _oddify(rec)
    return np.clip(rec, -2048, 2047)


def _quant_intra(coef: np.ndarray, qscale: int, w: np.ndarray) -> np.ndarray:
    qf = np.zeros((8, 8), dtype=np.int64)
    qf[0, 0] = int(np.round(coef[0, 0] / 8.0))
    # local search around the analytic estimate: the decoder arithmetic
    # is normative, so the encoder just picks the level whose normative
    # reconstruction is closest to the true coefficient
    est = np.round(16.0 * coef / (2.0 * qscale * w)).astype(np.int64)
    for y in range(8):
        for x in range(8):
            if y == 0 and x == 0:
                continue
            target = coef[y, x]
            best, bestd = 0, abs(target)
            for cand in range(est[y, x] - 2, est[y, x] + 3):
                if cand == 0:
                    continue
                rec = (2 * cand * qscale * int(w[y, x])) // 16
                if rec != 0 and rec % 2 == 0:
                    rec -= int(np.sign(rec))
                d = abs(target - rec)
                if d < bestd:
                    best, bestd = cand, d
            qf[y, x] = int(np.clip(best, -255, 255))
    return qf


def _quant_nonintra(coef: np.ndarray, qscale: int, w: np.ndarray) -> np.ndarray:
    qf = np.zeros((8, 8), dtype=np.int64)
    est = np.round(
        (16.0 * np.abs(coef) / (qscale * w) - 1.0) / 2.0
    ).astype(np.int64)
    for y in range(8):
        for x in range(8):
            target = coef[y, x]
            if abs(target) < 0.5:
                continue
            sgn = 1 if target > 0 else -1
            best, bestd = 0, abs(target)
            for mag in range(max(1, est[y, x] - 2), est[y, x] + 4):
                cand = sgn * mag
                num = (2 * cand + sgn) * qscale * int(w[y, x])
                rec = num // 16 if num >= 0 else -((-num) // 16)
                if rec != 0 and rec % 2 == 0:
                    rec -= sgn
                d = abs(target - rec)
                if d < bestd:
                    best, bestd = cand, d
            qf[y, x] = int(np.clip(best, -255, 255))
    return qf


# ---------------------------------------------------------------------------
# coefficient coding
# ---------------------------------------------------------------------------


def _write_dc(w: _BitWriter, diff: int, luma: bool) -> None:
    size = 0 if diff == 0 else int(abs(diff)).bit_length()
    if size > 8:
        raise ValueError("DC differential out of range")
    w.code((DC_SIZE_LUMA if luma else DC_SIZE_CHROMA)[size])
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        w.bits(v, size)


def _read_dc(r: _BitReader, luma: bool) -> int:
    size = _read_vlc(r, _TRIE_DC_L if luma else _TRIE_DC_C, "dc size")
    if size == 0:
        return 0
    v = r.bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _write_run_level(w: _BitWriter, run: int, level: int, first: bool) -> None:
    key = (run, abs(level))
    if key == (0, 1):
        w.code("1" if first else "11")
        w.bits(0 if level > 0 else 1, 1)
        return
    code = DCT_CODES.get(key)
    if code is not None:
        w.code(code)
        w.bits(0 if level > 0 else 1, 1)
        return
    # ESCAPE: 6-bit run, then 8-bit level, or marker byte + 8 more bits
    w.code(DCT_ESCAPE)
    w.bits(run, 6)
    if -127 <= level <= 127 and level != 0:
        w.bits(level & 0xFF, 8)
    elif 128 <= level <= 255:
        w.bits(0x00, 8)
        w.bits(level, 8)
    elif -255 <= level <= -128:
        w.bits(0x80, 8)
        w.bits(level & 0xFF, 8)
    else:
        raise ValueError("escape level out of range")


def _read_run_level(
    r: _BitReader, first: bool
) -> Optional[Tuple[int, int]]:
    """None = EOB. The first-coefficient '1s' form is peeked manually
    because it collides with EOB's prefix in the shared trie."""
    if first:
        if r.bit():
            sign = r.bit()
            return (0, -1 if sign else 1)
        # fall through into the trie with the consumed '0' replayed
        val = _read_vlc_after_zero(r)
    else:
        val = _read_vlc(r, _TRIE_DCT, "dct")
    if val == "eob":
        return None
    if val == "escape":
        run = r.bits(6)
        lv = r.bits(8)
        if lv == 0x00:
            level = r.bits(8)
        elif lv == 0x80:
            level = r.bits(8) - 256
        else:
            level = lv - 256 if lv >= 128 else lv
        if level == 0:
            raise ValueError("escape level 0")
        return (run, level)
    run, mag = val
    sign = r.bit()
    return (run, -mag if sign else mag)


_TRIE_DCT_AFTER_ZERO = _TRIE_DCT.get("0", {})


def _read_vlc_after_zero(r: _BitReader):
    node = _TRIE_DCT_AFTER_ZERO
    for _ in range(24):
        b = "1" if r.bit() else "0"
        nxt = node.get(b)
        if nxt is None:
            raise ValueError("invalid dct VLC")
        if isinstance(nxt, tuple):
            return nxt[1]
        node = nxt
    raise ValueError("runaway dct VLC")


def _write_block(
    w: _BitWriter, qf: np.ndarray, intra: bool, luma: bool,
    dc_pred: int,
) -> int:
    """Serialize one block's coefficients; returns the new DC predictor
    (intra only). ``qf`` is the 8x8 quantized-level matrix."""
    zz = qf[ZIGZAG[:, 0], ZIGZAG[:, 1]]
    if intra:
        _write_dc(w, int(zz[0]) - dc_pred, luma)
        new_pred = int(zz[0])
        start = 1
        first = False
    else:
        new_pred = dc_pred
        start = 0
        first = True
    run = 0
    for i in range(start, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        _write_run_level(w, run, v, first)
        first = False
        run = 0
    w.code(DCT_EOB)
    return new_pred


def _read_block(
    r: _BitReader, intra: bool, luma: bool, dc_pred: int
) -> Tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    if intra:
        dc_pred = dc_pred + _read_dc(r, luma)
        zz[0] = dc_pred
        i = 1
        first = False
    else:
        i = 0
        first = True
    while True:
        rl = _read_run_level(r, first)
        first = False
        if rl is None:
            break
        run, level = rl
        i += run
        if i >= 64:
            raise ValueError("dct run past block end")
        zz[i] = level
        i += 1
    qf = np.zeros((8, 8), dtype=np.int64)
    qf[ZIGZAG[:, 0], ZIGZAG[:, 1]] = zz
    return qf, dc_pred


# ---------------------------------------------------------------------------
# motion compensation
# ---------------------------------------------------------------------------


def _predict(plane: np.ndarray, y0: int, x0: int, h: int, w: int,
             dy: int, dx: int) -> np.ndarray:
    """Half-pel prediction block (h x w) from ``plane`` for a target at
    (y0, x0) with motion (dy, dx) in HALF-pel units. Uses the spec's
    rounding averages; callers guarantee in-bounds references."""
    iy, ix = y0 + (dy >> 1), x0 + (dx >> 1)
    hy, hx = dy & 1, dx & 1
    p = plane.astype(np.int32)
    a = p[iy : iy + h, ix : ix + w]
    if not hy and not hx:
        out = a
    elif hx and not hy:
        b = p[iy : iy + h, ix + 1 : ix + 1 + w]
        out = (a + b + 1) >> 1
    elif hy and not hx:
        b = p[iy + 1 : iy + 1 + h, ix : ix + w]
        out = (a + b + 1) >> 1
    else:
        b = p[iy : iy + h, ix + 1 : ix + 1 + w]
        c = p[iy + 1 : iy + 1 + h, ix : ix + w]
        d = p[iy + 1 : iy + 1 + h, ix + 1 : ix + 1 + w]
        out = (a + b + c + d + 2) >> 2
    return out


def _chroma_mv(d: int) -> int:
    """Chroma motion = luma motion / 2 with truncation toward zero, in
    half-pel units of the chroma grid."""
    return d // 2 if d >= 0 else -((-d) // 2)


def _mb_prediction(refs: List[Tuple[np.ndarray, ...]],
                   mvs: List[Tuple[int, int]],
                   my: int, mx: int) -> List[np.ndarray]:
    """[Y16, Cb8, Cr8] prediction for MB (my, mx) — one ref = plain MC,
    two refs = interpolated (rounded average)."""
    preds = []
    for (ry, rcb, rcr), (dy, dx) in zip(refs, mvs):
        py = _predict(ry, my * 16, mx * 16, 16, 16, dy, dx)
        cdy, cdx = _chroma_mv(dy), _chroma_mv(dx)
        pcb = _predict(rcb, my * 8, mx * 8, 8, 8, cdy, cdx)
        pcr = _predict(rcr, my * 8, mx * 8, 8, 8, cdy, cdx)
        preds.append((py, pcb, pcr))
    if len(preds) == 1:
        return list(preds[0])
    return [
        (preds[0][i].astype(np.int32) + preds[1][i] + 1) >> 1 for i in range(3)
    ]


def _mv_in_bounds(w: int, h: int, my: int, mx: int, dy: int, dx: int) -> bool:
    # integer base + half-pel flag must stay inside the reference
    y0, x0 = my * 16, mx * 16
    iy, ix = y0 + (dy >> 1), x0 + (dx >> 1)
    hy, hx = dy & 1, dx & 1
    if iy < 0 or ix < 0:
        return False
    if iy + 16 + hy > h or ix + 16 + hx > w:
        return False
    # chroma side
    cdy, cdx = _chroma_mv(dy), _chroma_mv(dx)
    ciy, cix = my * 8 + (cdy >> 1), mx * 8 + (cdx >> 1)
    chy, chx = cdy & 1, cdx & 1
    if ciy < 0 or cix < 0:
        return False
    if ciy + 8 + chy > h // 2 or cix + 8 + chx > w // 2:
        return False
    return True


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _motion_range_ok(d: int) -> bool:
    # f_code = 1: motion_code in [-7, 7] implemented, no residual bits
    return -7 <= d <= 7


class _MvPredictor:
    """Per-direction motion predictor with the spec's reset rules."""

    def __init__(self):
        self.dy = 0
        self.dx = 0

    def reset(self):
        self.dy = 0
        self.dx = 0


def _code_mv(w: _BitWriter, pred: _MvPredictor, dy: int, dx: int) -> None:
    for want, have, attr in ((dx, pred.dx, "dx"), (dy, pred.dy, "dy")):
        diff = want - have
        # f_code=1 wraparound range is [-16, 15] half-pels
        if diff < -16:
            diff += 32
        elif diff > 15:
            diff -= 32
        if not _motion_range_ok(diff):
            raise ValueError("motion differential outside implemented subset")
        w.code(MOTION_CODES[diff])
        setattr(pred, attr, want)


def _read_mv(r: _BitReader, pred: _MvPredictor) -> Tuple[int, int]:
    out = {}
    for attr in ("dx", "dy"):
        code = _read_vlc(r, _TRIE_MOTION, "motion")
        recon = getattr(pred, attr) + code
        if recon < -16:
            recon += 32
        elif recon > 15:
            recon -= 32
        setattr(pred, attr, recon)
        out[attr] = recon
    return out["dy"], out["dx"]


def _planes_to_blocks(yb: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """MB planes -> the six 8x8 blocks in coding order (Y0 Y1 Y2 Y3 Cb Cr)."""
    return [
        yb[0:8, 0:8], yb[0:8, 8:16], yb[8:16, 0:8], yb[8:16, 8:16], cb, cr
    ]


def encode_mpeg1(
    frames: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    pattern: Optional[str] = None,
    qscale: int = 8,
    frame_rate_code: int = 3,
    mv_hints: Optional[List[Optional[Tuple[int, int]]]] = None,
) -> bytes:
    """Encode 4:2:0 (Y, Cb, Cr) uint8 plane triples (display order;
    dimensions multiples of 16) into an MPEG-1 video elementary stream.

    ``pattern``: one letter per frame, e.g. ``"IPBP"`` (display order;
    B frames must sit between two references; defaults to ``"I" + "P"*``).
    ``mv_hints``: per-frame (dy, dx) HALF-pel candidate tried before the
    zero vector — per-MB decisions are then: zero-residual MC (or skip),
    coded residual when the block pattern is encoder-reachable
    ({luma-only, all-blocks}), intra fallback otherwise."""
    n = len(frames)
    if pattern is None:
        pattern = "I" + "P" * (n - 1)
    if len(pattern) != n:
        raise ValueError("pattern length != frame count")
    if pattern[0] != "I":
        raise ValueError("first frame must be I")
    h, w = frames[0][0].shape
    if h % 16 or w % 16:
        raise ValueError("dimensions must be multiples of 16")
    for fy, fcb, fcr in frames:
        if fy.shape != (h, w) or fcb.shape != (h // 2, w // 2):
            raise ValueError("inconsistent plane shapes")
    hints = mv_hints or [None] * n
    mby, mbx = h // 16, w // 16

    # display order -> decode order: each B needs its future reference
    # decoded first
    refs_display = [i for i, t in enumerate(pattern) if t in "IP"]
    for i, t in enumerate(pattern):
        if t == "B" and (i < refs_display[0] or i > refs_display[-1]):
            raise ValueError("B frame without surrounding references")
    # B frames decode directly AFTER the reference that closes their
    # display interval
    decode_order: List[int] = []
    prev_ref = None
    for i, t in enumerate(pattern):
        if t in "IP":
            decode_order.append(i)
            if prev_ref is not None:
                decode_order.extend(
                    j for j in range(prev_ref + 1, i) if pattern[j] == "B"
                )
            prev_ref = i
    bw = _BitWriter()
    bw.start_code(SEQ_START)
    bw.bits(w, 12)
    bw.bits(h, 12)
    bw.bits(1, 4)   # aspect: square
    bw.bits(frame_rate_code, 4)
    bw.bits(0x3FFFF, 18)  # variable bitrate
    bw.bits(1, 1)   # marker
    bw.bits(0, 10)  # vbv buffer
    bw.bits(0, 1)   # constrained flag
    bw.bits(0, 1)   # no custom intra matrix
    bw.bits(0, 1)   # no custom non-intra matrix
    bw.start_code(GOP_START)
    bw.bits(0, 25)  # timecode
    bw.bits(1, 1)   # closed gop
    bw.bits(0, 1)   # broken link

    recon: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    for disp_idx in decode_order:
        ptype = pattern[disp_idx]
        src = tuple(p.astype(np.int32) for p in frames[disp_idx])
        fwd_ref = bwd_ref = None
        if ptype in "PB":
            fwd_ref = recon[max(r for r in refs_display if r < disp_idx)]
        if ptype == "B":
            bwd_ref = recon[min(r for r in refs_display if r > disp_idx)]

        bw.start_code(PIC_START)
        bw.bits(disp_idx % 1024, 10)  # temporal reference
        bw.bits({"I": 1, "P": 2, "B": 3}[ptype], 3)
        bw.bits(0xFFFF, 16)  # vbv_delay
        if ptype in "PB":
            bw.bits(0, 1)  # full_pel_forward = half-pel units
            bw.bits(1, 3)  # forward_f_code
        if ptype == "B":
            bw.bits(0, 1)
            bw.bits(1, 3)

        out_y = np.zeros((h, w), dtype=np.int32)
        out_cb = np.zeros((h // 2, w // 2), dtype=np.int32)
        out_cr = np.zeros((h // 2, w // 2), dtype=np.int32)
        hint = hints[disp_idx]
        if mby > 0xAF:
            raise ValueError("frame too tall for one-slice-per-row layout")

        for row in range(mby):
            bw.start_code(bytes([0, 0, 1, row + 1]))
            bw.bits(qscale, 5)
            bw.bits(0, 1)  # no extra slice info
            dc_pred = [128, 128, 128]  # Y, Cb, Cr (level units of 8)
            fpred, bpred = _MvPredictor(), _MvPredictor()
            prev_addr = row * mbx - 1  # slice-relative previous address
            prev_b_mode: Optional[tuple] = None
            for col in range(mbx):
                addr = row * mbx + col
                my, mx = row, col
                sy = slice(my * 16, my * 16 + 16)
                sx = slice(mx * 16, mx * 16 + 16)
                cy = slice(my * 8, my * 8 + 8)
                cx = slice(mx * 8, mx * 8 + 8)
                cur = (src[0][sy, sx], src[1][cy, cx], src[2][cy, cx])

                decision = None  # (kind, ...)
                if ptype != "I":
                    cands: List[Tuple[str, List[Tuple[int, int]]]] = []
                    if ptype == "P":
                        if hint is not None:
                            cands.append(("fwd", [hint]))
                        cands.append(("fwd", [(0, 0)]))
                    else:
                        if hint is not None:
                            cands.append(("fwd", [hint]))
                            cands.append(("bwd", [hint]))
                        cands.append(("fwd", [(0, 0)]))
                        cands.append(("bwd", [(0, 0)]))
                        cands.append(("interp", [(0, 0), (0, 0)]))
                    for kind, mvs in cands:
                        if kind == "fwd":
                            refl, mvl = [fwd_ref], mvs
                        elif kind == "bwd":
                            refl, mvl = [bwd_ref], mvs
                        else:
                            refl, mvl = [fwd_ref, bwd_ref], mvs
                        if any(
                            not _mv_in_bounds(w, h, my, mx, dy, dx)
                            for dy, dx in mvl
                        ):
                            continue
                        pred = _mb_prediction(refl, mvl, my, mx)
                        if (
                            np.array_equal(pred[0], cur[0])
                            and np.array_equal(pred[1], cur[1])
                            and np.array_equal(pred[2], cur[2])
                        ):
                            decision = ("copy", kind, mvl, pred)
                            break
                    if decision is None and ptype == "P":
                        # coded residual against the best in-bounds
                        # candidate if the block pattern is reachable
                        for kind, mvs in cands:
                            if any(
                                not _mv_in_bounds(w, h, my, mx, dy, dx)
                                for dy, dx in mvs
                            ):
                                continue
                            pred = _mb_prediction([fwd_ref], mvs, my, mx)
                            resid = [c - p for c, p in zip(cur, pred)]
                            blocks = _planes_to_blocks(*resid)
                            qfs = [
                                _quant_nonintra(
                                    _fdct(b), qscale, DEFAULT_NONINTRA_Q
                                )
                                for b in blocks
                            ]
                            cbp = 0
                            for bi, qf in enumerate(qfs):
                                if np.any(qf):
                                    cbp |= 1 << (5 - bi)
                            if cbp in CBP_CODES and cbp != 0:
                                decision = ("coded", kind, mvs, pred, qfs, cbp)
                                break
                            break  # only the first in-bounds candidate

                # --- emit -------------------------------------------------
                def _emit_addr():
                    nonlocal prev_addr
                    inc = addr - prev_addr
                    while inc > 33:
                        bw.code(MBA_ESCAPE)
                        inc -= 33
                    bw.code(MBA_CODES[inc])
                    prev_addr = addr

                skippable = (
                    0 < col < mbx - 1
                    and decision is not None
                    and decision[0] == "copy"
                )
                if (
                    skippable
                    and ptype == "P"
                    and decision[1] == "fwd"
                    and decision[2] == [(0, 0)]
                ):
                    # skipped P MB: zero vector, no residual; predictors
                    # reset per spec
                    fpred.reset()
                    pred = decision[3]
                    out_y[sy, sx], out_cb[cy, cx], out_cr[cy, cx] = pred
                    dc_pred = [128, 128, 128]
                    continue
                if (
                    skippable
                    and ptype == "B"
                    and prev_b_mode is not None
                    and prev_b_mode == (decision[1], tuple(decision[2]))
                ):
                    pred = decision[3]
                    out_y[sy, sx], out_cb[cy, cx], out_cr[cy, cx] = pred
                    dc_pred = [128, 128, 128]
                    continue

                _emit_addr()
                if decision is None:
                    # intra macroblock
                    if ptype == "I":
                        bw.code("1")
                    elif ptype == "P":
                        bw.code("00011")
                        fpred.reset()
                    else:
                        bw.code("00011")
                        fpred.reset()
                        bpred.reset()
                        prev_b_mode = None
                    blocks = _planes_to_blocks(*cur)
                    for bi, blk in enumerate(blocks):
                        qf = _quant_intra(_fdct(blk), qscale, DEFAULT_INTRA_Q)
                        comp = 0 if bi < 4 else (1 if bi == 4 else 2)
                        dc_pred[comp] = _write_block(
                            bw, qf, True, bi < 4, dc_pred[comp]
                        )
                        rec = _recon_intra(qf, qscale, DEFAULT_INTRA_Q)
                        pix = np.clip(
                            np.floor(_idct(rec) + 0.5), 0, 255
                        ).astype(np.int32)
                        _store_block(out_y, out_cb, out_cr, my, mx, bi, pix)
                    continue

                kind = decision[1]
                mvl = decision[2]
                pred = decision[3]
                coded = decision[0] == "coded"
                if ptype == "P":
                    bw.code("1" if coded else "001")
                    _code_mv(bw, fpred, *mvl[0])
                else:
                    if kind == "fwd":
                        bw.code("0011" if coded else "0010")
                        _code_mv(bw, fpred, *mvl[0])
                    elif kind == "bwd":
                        bw.code("011" if coded else "010")
                        _code_mv(bw, bpred, *mvl[0])
                    else:
                        bw.code("11" if coded else "10")
                        _code_mv(bw, fpred, *mvl[0])
                        _code_mv(bw, bpred, *mvl[1])
                    prev_b_mode = (kind, tuple(mvl))
                dc_pred = [128, 128, 128]
                if coded:
                    qfs, cbp = decision[4], decision[5]
                    bw.code(CBP_CODES[cbp])
                    rec_pix = []
                    for bi, qf in enumerate(qfs):
                        if cbp & (1 << (5 - bi)):
                            _write_block(bw, qf, False, bi < 4, 0)
                            rec = _recon_nonintra(
                                qf, qscale, DEFAULT_NONINTRA_Q
                            )
                            rp = np.floor(_idct(rec) + 0.5).astype(np.int32)
                        else:
                            rp = np.zeros((8, 8), dtype=np.int32)
                        rec_pix.append(rp)
                    final = _assemble_mb(pred, rec_pix)
                else:
                    final = [p.copy() for p in pred]
                out_y[sy, sx] = np.clip(final[0], 0, 255)
                out_cb[cy, cx] = np.clip(final[1], 0, 255)
                out_cr[cy, cx] = np.clip(final[2], 0, 255)

        rec_frame = (
            out_y.astype(np.uint8),
            out_cb.astype(np.uint8),
            out_cr.astype(np.uint8),
        )
        if ptype in "IP":
            recon[disp_idx] = tuple(p.astype(np.int32) for p in rec_frame)

    bw.start_code(SEQ_END)
    return bw.bytes_out()


def _store_block(out_y, out_cb, out_cr, my, mx, bi, pix):
    if bi < 4:
        yy = my * 16 + (bi // 2) * 8
        xx = mx * 16 + (bi % 2) * 8
        out_y[yy : yy + 8, xx : xx + 8] = pix
    elif bi == 4:
        out_cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = pix
    else:
        out_cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = pix


def _assemble_mb(pred, rec_pix):
    y = pred[0].astype(np.int32).copy()
    cb = pred[1].astype(np.int32).copy()
    cr = pred[2].astype(np.int32).copy()
    for bi, rp in enumerate(rec_pix):
        if bi < 4:
            yy, xx = (bi // 2) * 8, (bi % 2) * 8
            y[yy : yy + 8, xx : xx + 8] += rp
        elif bi == 4:
            cb += rp
        else:
            cr += rp
    return [y, cb, cr]


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _find_start_codes(data: bytes) -> List[Tuple[int, int]]:
    """[(byte_pos_of_00 00 01, code_byte), ...]"""
    out = []
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0 or j + 3 >= len(data):
            return out
        out.append((j, data[j + 3]))
        i = j + 3


def decode_mpeg1(payload: bytes):
    """Decode an MPEG-1 video elementary stream into display-order
    ``[(Y, Cb, Cr) uint8 plane triples]`` plus ``(width, height, fps)``.
    Implements the documented syntax subset; anything outside it raises
    ValueError (decoder-boundary contract)."""
    if not is_mpeg1(payload):
        raise ValueError("not an MPEG-1 video stream")
    codes = _find_start_codes(payload)
    r = _BitReader(payload, (codes[0][0] + 4) * 8)
    width = r.bits(12)
    height = r.bits(12)
    r.bits(4)
    frc = r.bits(4)
    fps = FRAME_RATES.get(frc, 25.0)
    r.bits(18)
    r.bits(1)
    r.bits(10)
    r.bits(1)
    if r.bit():  # custom intra matrix
        for _ in range(64):
            r.bits(8)
        raise ValueError("custom quant matrices not in the implemented subset")
    if r.bit():
        raise ValueError("custom quant matrices not in the implemented subset")
    if width % 16 or height % 16:
        raise ValueError("non-MB-aligned dimensions not in subset")
    mby, mbx = height // 16, width // 16

    # group pictures: picture start + its slices
    pics: List[Tuple[int, int, List[int]]] = []  # (pic_pos, next_idx, slices)
    for idx, (pos, code) in enumerate(codes):
        if code == 0x00:
            pics.append([pos, idx, []])
        elif 0x01 <= code <= 0xAF and pics:
            pics[-1][2].append(pos)

    out_frames: List[Tuple] = []
    cur_refs: List = [None, None]  # [older ref, newest ref]

    for pic_pos, _idx, slice_positions in pics:
        pr = _BitReader(payload, (pic_pos + 4) * 8)
        pr.bits(10)  # temporal reference (reordering handled structurally)
        ptype = pr.bits(3)
        pr.bits(16)
        if ptype not in (1, 2, 3):
            raise ValueError(f"picture type {ptype} not in subset")
        if ptype in (2, 3):
            if pr.bit():
                raise ValueError("full-pel vectors not in subset")
            if pr.bits(3) != 1:
                raise ValueError("f_code > 1 not in subset")
        if ptype == 3:
            if pr.bit():
                raise ValueError("full-pel vectors not in subset")
            if pr.bits(3) != 1:
                raise ValueError("f_code > 1 not in subset")

        y = np.zeros((height, width), dtype=np.int32)
        cb = np.zeros((height // 2, width // 2), dtype=np.int32)
        cr = np.zeros((height // 2, width // 2), dtype=np.int32)
        fwd_ref = bwd_ref = None
        if ptype == 2:
            fwd_ref = cur_refs[1]
            if fwd_ref is None:
                raise ValueError("P picture without a reference")
        elif ptype == 3:
            fwd_ref, bwd_ref = cur_refs[0], cur_refs[1]
            if fwd_ref is None or bwd_ref is None:
                raise ValueError("B picture without two references")

        for spos in slice_positions:
            sr = _BitReader(payload, (spos + 3) * 8)
            row = sr.bits(8) - 1
            qscale = sr.bits(5)
            while sr.bit():
                sr.bits(8)
            dc_pred = [128, 128, 128]
            fpred, bpred = _MvPredictor(), _MvPredictor()
            prev_addr = row * mbx - 1
            prev_b = None  # (kind, mvs) for skipped-B repetition
            while True:
                # end of slice: zero padding to alignment, then a start
                # code (the encoder never writes extra zero stuffing)
                byte_i = sr.pos >> 3
                rem = sr.pos & 7
                if rem == 0:
                    if payload[byte_i : byte_i + 3] == b"\x00\x00\x01":
                        break
                else:
                    mask = (1 << (8 - rem)) - 1
                    if (payload[byte_i] & mask) == 0 and payload[
                        byte_i + 1 : byte_i + 4
                    ] == b"\x00\x00\x01":
                        break
                inc = 0
                val = _read_vlc(sr, _TRIE_MBA, "mba")
                while val in ("escape", "stuffing"):
                    if val == "escape":
                        inc += 33
                    val = _read_vlc(sr, _TRIE_MBA, "mba")
                inc += val
                addr = prev_addr + inc
                # skipped macroblocks
                for sk in range(prev_addr + 1, addr):
                    smy, smx = divmod(sk, mbx)
                    if ptype == 2:
                        pred = _mb_prediction([fwd_ref], [(0, 0)], smy, smx)
                        fpred.reset()
                    elif ptype == 3 and prev_b is not None:
                        kind, mvs = prev_b
                        refl = {
                            "fwd": [fwd_ref], "bwd": [bwd_ref],
                            "interp": [fwd_ref, bwd_ref],
                        }[kind]
                        pred = _mb_prediction(refl, list(mvs), smy, smx)
                    else:
                        raise ValueError("skipped MB without context")
                    _store_mb(y, cb, cr, smy, smx, pred)
                    dc_pred = [128, 128, 128]
                prev_addr = addr
                my, mx = divmod(addr, mbx)
                trie = {1: _TRIE_MBTYPE_I, 2: _TRIE_MBTYPE_P,
                        3: _TRIE_MBTYPE_B}[ptype]
                quant, mcf, mcb, coded, intra = _read_vlc(sr, trie, "mbtype")
                if quant:
                    qscale = sr.bits(5)
                mvs = []
                kind = None
                if mcf:
                    mvs.append(_read_mv(sr, fpred))
                    kind = "fwd"
                if mcb:
                    mvs.append(_read_mv(sr, bpred))
                    kind = "interp" if mcf else "bwd"
                if intra:
                    fpred.reset()
                    bpred.reset()
                    if ptype == 3:
                        prev_b = None
                    pix_blocks = []
                    for bi in range(6):
                        comp = 0 if bi < 4 else (1 if bi == 4 else 2)
                        qf, dc_pred[comp] = _read_block(
                            sr, True, bi < 4, dc_pred[comp]
                        )
                        rec = _recon_intra(qf, qscale, DEFAULT_INTRA_Q)
                        pix_blocks.append(
                            np.clip(np.floor(_idct(rec) + 0.5), 0, 255)
                        )
                    _store_mb_blocks(y, cb, cr, my, mx, pix_blocks)
                    continue
                dc_pred = [128, 128, 128]
                if ptype == 2:
                    if not mcf:
                        mvs = [(0, 0)]
                        fpred.reset()
                    pred = _mb_prediction([fwd_ref], mvs, my, mx)
                else:
                    refl = {
                        "fwd": [fwd_ref], "bwd": [bwd_ref],
                        "interp": [fwd_ref, bwd_ref],
                    }[kind]
                    pred = _mb_prediction(refl, mvs, my, mx)
                    prev_b = (kind, tuple(mvs))
                if coded:
                    cbp = _read_vlc(sr, _TRIE_CBP, "cbp")
                    rec_pix = []
                    for bi in range(6):
                        if cbp & (1 << (5 - bi)):
                            qf, _ = _read_block(sr, False, bi < 4, 0)
                            rec = _recon_nonintra(
                                qf, qscale, DEFAULT_NONINTRA_Q
                            )
                            rec_pix.append(
                                np.floor(_idct(rec) + 0.5).astype(np.int32)
                            )
                        else:
                            rec_pix.append(np.zeros((8, 8), dtype=np.int32))
                    final = _assemble_mb(pred, rec_pix)
                else:
                    final = pred
                _store_mb(
                    y, cb, cr, my, mx,
                    [np.clip(f, 0, 255) for f in final],
                )

        frame = (
            y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8)
        )
        if ptype in (1, 2):
            # emit the previous reference, hold this one
            if cur_refs[1] is not None:
                out_frames.append(_to_u8(cur_refs[1]))
            cur_refs[0] = cur_refs[1]
            cur_refs[1] = tuple(p.astype(np.int32) for p in frame)
        else:
            out_frames.append(frame)
    if cur_refs[1] is not None:
        out_frames.append(_to_u8(cur_refs[1]))
    return out_frames, (width, height, fps)


def _to_u8(planes):
    return tuple(p.astype(np.uint8) for p in planes)


def _store_mb(y, cb, cr, my, mx, pred):
    y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = pred[0]
    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = pred[1]
    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = pred[2]


def _store_mb_blocks(y, cb, cr, my, mx, blocks):
    for bi, blk in enumerate(blocks):
        if bi < 4:
            yy = my * 16 + (bi // 2) * 8
            xx = mx * 16 + (bi % 2) * 8
            y[yy : yy + 8, xx : xx + 8] = blk
        elif bi == 4:
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = blk
        else:
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = blk


# ---------------------------------------------------------------------------
# RGB + frame sampling integration
# ---------------------------------------------------------------------------


def ycbcr420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Full-range BT.601 (the JFIF convention the other codecs use) with
    nearest-neighbor chroma upsampling — HxWx3 uint8."""
    cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(np.float64)
    cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(np.float64)
    yf = y.astype(np.float64)
    r = yf + 1.402 * (cru - 128.0)
    g = yf - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0)
    b = yf + 1.772 * (cbu - 128.0)
    return np.clip(
        np.stack([r, g, b], axis=2) + 0.5, 0, 255
    ).astype(np.uint8)


def rgb_to_ycbcr420(rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encoder-side companion (JFIF full-range, 2x2 mean subsampling)."""
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
    cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]

    def sub(p):
        h, w = p.shape
        return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    return (
        np.clip(y + 0.5, 0, 255).astype(np.uint8),
        np.clip(sub(cb) + 0.5, 0, 255).astype(np.uint8),
        np.clip(sub(cr) + 0.5, 0, 255).astype(np.uint8),
    )


def mpeg1_fps(payload: bytes) -> float:
    """Frame rate from the sequence header alone (no frame decode)."""
    if not is_mpeg1(payload):
        raise ValueError("not an MPEG-1 video stream")
    r = _BitReader(payload, 4 * 8)
    r.bits(12)
    r.bits(12)
    r.bits(4)
    return FRAME_RATES.get(r.bits(4), 25.0)


def decode_mpeg1_frames(
    payload: bytes,
    every_n_frames: int = 1,
    max_frames: Optional[int] = None,
) -> Tuple[int, int, float, List[Tuple[int, np.ndarray]]]:
    """(width, height, fps, [(frame_index, HxWx3 RGB uint8), ...]) — the
    ``decode_avi_frames`` contract for MPEG-1 elementary streams."""
    frames, (w, h, fps) = decode_mpeg1(payload)
    out = []
    for i in range(0, len(frames), max(1, every_n_frames)):
        out.append((i, ycbcr420_to_rgb(*frames[i])))
        if max_frames is not None and len(out) >= max_frames:
            break
    return w, h, fps, out
