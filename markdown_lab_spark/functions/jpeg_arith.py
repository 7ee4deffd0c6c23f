"""Arithmetic-coded JPEG (SOF9 sequential + SOF10 progressive) codec in
pure numpy/python — the QM coder of ITU-T T.81 Annex D with the Annex F
sequential and Annex G progressive statistical models, no native deps.

This closes the engine's last declared JPEG stubs: 8-bit frames,
grayscale or YCbCr up to 2x2 sampling, DAC conditioning segments (L/U
DC bounds, Kx AC threshold), restart markers (full coder + statistics
reset), and for SOF10 all four progressive scan types (DC first/refine,
AC first/refine with per-k EOB decisions gated past EOBx).

Fidelity posture, stated honestly:
- The probability-estimation state machine is the 113-state Qe table of
  T.81 Table D.3 (plus the fixed 0x5A1D bin the AC sign decision uses),
  transcribed from the public spec as mirrored in every public
  implementation (libjpeg's jaricom/jcarith/jdarith are the reference
  formulation of these flowcharts).
- The statistical models (DC: S0/SS/SP/SN + conditioning categories
  from the L/U bounds; AC: 3-bins-per-k EOB/run/magnitude lanes with
  the Kx low/high split) follow T.81 F.1.4.4 exactly.
- Encoder and decoder are an internally mirrored pair: the decoder's
  register geometry is derived from the encoder's (big-endian code
  fraction, 0xFF00 byte stuffing, carry by byte back-propagation), and
  round-trip equality is pinned by test at the bit, block, and image
  level. Cross-validation against an external arithmetic decoder runs
  through the native-backend seam when a native library exists (none
  ships in this environment — the same declared boundary as the other
  codecs).

Reference behavior this maps: the reference repo has no codecs at all
(scale-posture component, not parity — see ROADMAP.md); coefficient
math is shared with functions/jpeg.py so an arithmetic encode of an
image carries coefficients IDENTICAL to its baseline encode, and the
tests pin pixel equality between the two entropy paths.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from .jpeg import (
    ZIGZAG,
    _C,
    _finish_planes,
    _padded_planes,
    _prepare_planes,
    _quantize_blocks,
)

# ---------------------------------------------------------------------------
# T.81 Table D.3 — Qe value and probability estimation state machine.
# Each row: (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS).
# Row 113 is the non-adaptive 0.5-probability bin (AC sign decisions).
# ---------------------------------------------------------------------------

_QM = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 101, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 105, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 110, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 112, 112, 0), (0x59EB, 112, 112, 1), (0x5A1D, 113, 113, 0),
]

_FIXED_BIN = 113  # non-adaptive 0.5-probability state (never updated)

# statistics areas (bins are 1 byte: bit7 = MPS sense, bits 0-6 = index)
_DC_BINS = 64
_AC_BINS = 256


class _ArithEncoder:
    """QM encoder register pipeline (T.81 D.1): MPS occupies the base of
    the interval, renormalization drives probability estimation, bytes
    leave at C bits 19-26 with carry resolved over a pending buffer /
    stacked-0xFF / stacked-0x00 triple, and every emitted 0xFF is
    followed by a stuffed 0x00 so the entropy stream stays marker-free."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending committed byte (-1 = none yet)
        self.sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self.zc = 0  # stacked 0x00 bytes (lazy-emitted)
        self.out = bytearray()
        # row 113 maps to itself with Switch=0, so this bin never changes
        self._fixed = bytearray([_FIXED_BIN])

    # -- byte plumbing ------------------------------------------------

    def _emit(self, b: int) -> None:
        self.out.append(b & 0xFF)

    def _flush_zeros(self) -> None:
        if self.zc:
            self.out.extend(b"\x00" * self.zc)
            self.zc = 0

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry ripples through the pending byte and every stacked 0xFF
            if self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)  # stuff
            self.zc += self.sc  # carried 0xFF bytes become 0x00
            self.sc = 0
            # the 3 spacer bits guarantee temp & 0xFF != 0xFF here
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # can still be consumed by a future carry
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer)
            if self.sc:
                self._flush_zeros()
                self.out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct = 8

    # -- coding -------------------------------------------------------

    def encode(self, states: bytearray, i: int, bit: int) -> None:
        sv = states[i]
        qe, nmps, nlps, sw = _QM[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit == mps:
            if self.a >= 0x8000:
                return  # no renorm -> no estimation update
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            states[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:  # LPS takes the top subinterval
                self.c += self.a
                self.a = qe
            # else exchange: LPS keeps the (larger) base subinterval
            if sw:
                mps ^= 1
            states[i] = (mps << 7) | nlps
        while True:
            self.a = (self.a << 1) & 0x1FFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    def encode_fixed(self, bit: int) -> None:
        self.encode(self._fixed, 0, bit)

    def flush(self) -> bytes:
        """T.81 D.1.8 termination: pick the code point with the most
        trailing zeros inside the final interval, spill it, drop
        trailing zero bytes (the decoder zero-feeds at markers)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zeros()
                self._emit(self.buffer)
            if self.sc:
                self._flush_zeros()
                self.out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
        if self.c & 0x7FFF800:
            self._flush_zeros()
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)
        return bytes(self.out)


class _ArithDecoder:
    """Mirror of _ArithEncoder: C holds the 16-bit offset within the
    current interval at bits 16-31 plus 16 bits of stream lookahead
    below; BYTEIN applies the 0xFF00 unstuffing and zero-feeds once a
    marker (or end of data) is reached — T.81's convention for
    arithmetic scans, where hitting the next marker mid-scan is legal."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.marker = 0  # marker code seen (0xD0..0xD9...), 0 = none
        self.marker_pos = -1  # offset of the 0xFF that started it
        self._fixed = bytearray([_FIXED_BIN])
        self._init_registers()

    def _init_registers(self) -> None:
        self.a = 0x10000
        c = 0
        for _ in range(4):
            c = (c << 8) | self._fetch()
        self.c = c
        self.ct = 8

    def _fetch(self) -> int:
        if self.marker:
            return 0
        d = self.data
        n = len(d)
        if self.pos >= n:
            self.marker = 0xD9  # treat EOF as EOI
            self.marker_pos = n
            return 0
        b = d[self.pos]
        self.pos += 1
        if b != 0xFF:
            return b
        ff_at = self.pos - 1
        while self.pos < n and d[self.pos] == 0xFF:
            self.pos += 1
        if self.pos >= n:
            self.marker = 0xD9
            self.marker_pos = ff_at
            return 0
        nxt = d[self.pos]
        self.pos += 1
        if nxt == 0:
            return 0xFF  # stuffed zero byte -> literal 0xFF
        self.marker = nxt
        self.marker_pos = self.pos - 2
        return 0

    def restart(self) -> int:
        """Resync past the pending RSTn marker and re-init the coder.
        Returns the marker code consumed."""
        if not self.marker:
            # marker not yet reached in the lookahead: scan forward
            d, n = self.data, len(self.data)
            p = self.pos
            while p < n and not (
                d[p] == 0xFF and p + 1 < n and d[p + 1] != 0x00 and d[p + 1] != 0xFF
            ):
                p += 1
            if p >= n:
                raise ValueError("expected restart marker")
            self.marker = d[p + 1]
            self.marker_pos = p
        m = self.marker
        self.pos = self.marker_pos + 2
        self.marker = 0
        self.marker_pos = -1
        self._init_registers()
        return m

    def decode(self, states: bytearray, i: int) -> int:
        sv = states[i]
        qe, nmps, nlps, sw = _QM[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a >= 0x8000:
                return mps  # fast path: no renorm, no estimation update
            if self.a < qe:  # conditional exchange
                d = mps ^ 1
                if sw:
                    mps ^= 1
                states[i] = (mps << 7) | nlps
            else:
                d = mps
                states[i] = (mps << 7) | nmps
        else:
            self.c -= self.a << 16
            if self.a < qe:  # conditional exchange
                d = mps
                states[i] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                if sw:
                    mps ^= 1
                states[i] = (mps << 7) | nlps
            self.a = qe
        while True:
            self.a = (self.a << 1) & 0x1FFFF
            self.c = (self.c << 1) & 0xFFFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self.c |= self._fetch()
                self.ct = 8
            if self.a >= 0x8000:
                break
        return d

    def decode_fixed(self) -> int:
        return self.decode(self._fixed, 0)


# ---------------------------------------------------------------------------
# T.81 F.1.4.4 sequential statistical models (DC diff + AC run/level)
# ---------------------------------------------------------------------------


def _encode_dc(enc, st, ctx, ci, diff, dc_l, dc_u):
    """Figure F.4-F.9: encode a DC difference and update the component's
    conditioning category in ctx."""
    s0 = ctx[ci]
    if diff == 0:
        enc.encode(st, s0, 0)
        ctx[ci] = 0
        return
    enc.encode(st, s0, 1)
    if diff > 0:
        enc.encode(st, s0 + 1, 0)  # SS: sign
        base = s0 + 2  # SP
        cat = 4
    else:
        diff = -diff
        enc.encode(st, s0 + 1, 1)
        base = s0 + 3  # SN
        cat = 8
    m = 0
    v = diff - 1
    pos = base
    if v:
        enc.encode(st, pos, 1)
        m = 1
        v2 = v
        pos = 20  # X1
        while v2 >> 1:
            v2 >>= 1
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
    enc.encode(st, pos, 0)
    if m < (1 << dc_l) >> 1:
        cat = 0
    elif m > (1 << dc_u) >> 1:
        cat += 8  # -> 12 / 16
    ctx[ci] = cat
    pos += 14  # magnitude-bit bins
    mm = m
    while mm := mm >> 1:
        enc.encode(st, pos, 1 if (mm & v) else 0)


def _decode_dc(dec, st, ctx, ci, dc_l, dc_u):
    s0 = ctx[ci]
    if dec.decode(st, s0) == 0:
        ctx[ci] = 0
        return 0
    sign = dec.decode(st, s0 + 1)
    pos = s0 + 2 + sign
    m = dec.decode(st, pos)
    if m:
        pos = 20
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            pos += 1
    if m < (1 << dc_l) >> 1:
        ctx[ci] = 0
    elif m > (1 << dc_u) >> 1:
        ctx[ci] = 12 + sign * 4
    else:
        ctx[ci] = 4 + sign * 4
    v = m
    pos += 14
    while m := m >> 1:
        if dec.decode(st, pos):
            v |= m
    v += 1
    return -v if sign else v


def _encode_ac(enc, st, zz, kx):
    """Encode zigzag AC coefficients zz[1..63] (F.1.4.4.2)."""
    ke = 0
    for k in range(63, 0, -1):
        if zz[k]:
            ke = k
            break
    k = 1
    while k <= ke:
        s = 3 * (k - 1)
        enc.encode(st, s, 0)  # not EOB
        v = int(zz[k])
        while v == 0:
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
            v = int(zz[k])
        enc.encode(st, s + 1, 1)
        if v > 0:
            enc.encode_fixed(0)
        else:
            v = -v
            enc.encode_fixed(1)
        s += 2
        m = 0
        vm = v - 1
        if vm:
            enc.encode(st, s, 1)
            m = 1
            v2 = vm
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, s, 1)
                m <<= 1
                s = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
        enc.encode(st, s, 0)
        s += 14
        while m := m >> 1:
            enc.encode(st, s, 1 if (m & vm) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _decode_ac(dec, st, zz, kx):
    k = 1
    while k <= 63:
        s = 3 * (k - 1)
        if dec.decode(st, s):
            break  # EOB
        while dec.decode(st, s + 1) == 0:
            s += 3
            k += 1
            if k > 63:
                raise ValueError("arith AC run overflow")
        sign = dec.decode_fixed()
        s += 2
        m = dec.decode(st, s)
        if m:
            if dec.decode(st, s):
                m <<= 1
                s = 189 if k <= kx else 217
                while dec.decode(st, s):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    s += 1
        v = m
        s += 14
        while m := m >> 1:
            if dec.decode(st, s):
                v |= m
        v += 1
        zz[k] = -v if sign else v
        k += 1


# ---------------------------------------------------------------------------
# scan-level decode (called from jpeg.decode_jpeg's marker loop)
# ---------------------------------------------------------------------------


def decode_arith_scan(data, pos, frame, scan, quant, dac, restart_interval,
                      precision=8):
    """Sequential arithmetic scan: per-MCU entropy decode into zigzag
    coefficient rows, then the same single vectorized dequant + IDCT per
    component as the huffman path (jpeg._decode_scan)."""
    if precision != 8:
        raise ValueError("arithmetic coding supported for 8-bit frames only")
    width, height, ncomp, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_y * 8 * v_, mcus_x * 8 * h_), dtype=np.float64)
        for _cid, h_, v_, _tq in comps
    ]
    scan_by_cid = {s[0]: s for s in scan}
    dec = _ArithDecoder(data, pos)
    dc_stats: Dict[int, bytearray] = {}
    ac_stats: Dict[int, bytearray] = {}
    for _cs, td, ta in scan:
        dc_stats.setdefault(td, bytearray(_DC_BINS))
        ac_stats.setdefault(ta, bytearray(_AC_BINS))
    dc_ctx = [0] * ncomp
    last_dc = [0] * ncomp
    # per-component conditioning: DAC maps ("dc", t) -> (L, U) and
    # ("ac", t) -> Kx; defaults per T.81 (L=0, U=1, Kx=5)
    cond = []
    for cid, _h, _v, _tq in comps:
        _cs, td, ta = scan_by_cid[cid]
        dl, du = dac.get(("dc", td), (0, 1))
        kx = dac.get(("ac", ta), 5)
        cond.append((td, ta, dl, du, kx))
    mcu_count = 0
    comp_zz: List[List[np.ndarray]] = [[] for _ in comps]
    comp_pos: List[List[Tuple[int, int]]] = [[] for _ in comps]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                dec.restart()
                for tb in dc_stats:
                    dc_stats[tb] = bytearray(_DC_BINS)
                for tb in ac_stats:
                    ac_stats[tb] = bytearray(_AC_BINS)
                dc_ctx = [0] * ncomp
                last_dc = [0] * ncomp
            mcu_count += 1
            for ci, (cid, h, v, _tq) in enumerate(comps):
                td, ta, dl, du, kx = cond[ci]
                for by in range(v):
                    for bx in range(h):
                        zz = np.zeros(64, dtype=np.int64)
                        diff = _decode_dc(dec, dc_stats[td], dc_ctx, ci, dl, du)
                        last_dc[ci] += diff
                        zz[0] = last_dc[ci]
                        _decode_ac(dec, ac_stats[ta], zz, kx)
                        comp_zz[ci].append(zz)
                        comp_pos[ci].append(((my * v + by) * 8, (mx * h + bx) * 8))
    for ci, (_cid, _h, _v, tq) in enumerate(comps):
        if not comp_zz[ci]:
            continue
        allzz = np.stack(comp_zz[ci])
        qvec = quant[tq][ZIGZAG[:, 0], ZIGZAG[:, 1]].astype(np.float64)
        coefs = np.zeros((len(allzz), 8, 8), dtype=np.float64)
        coefs[:, ZIGZAG[:, 0], ZIGZAG[:, 1]] = allzz * qvec
        blocks = np.einsum("ux,nuv,vy->nxy", _C, coefs, _C, optimize=True) + 128.0
        plane = planes[ci]
        for (y0, x0), block in zip(comp_pos[ci], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = block
    return _finish_planes(planes, comps, hmax, vmax, width, height, ncomp, 8)


# ---------------------------------------------------------------------------
# encoder (fixtures + sinks)
# ---------------------------------------------------------------------------


def encode_jpeg_arith(
    arr: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    dc_l: int = 0,
    dc_u: int = 1,
    ac_kx: int = 5,
) -> bytes:
    """Arithmetic-coded sequential JPEG (SOF9) for an 8-bit grayscale
    (HxW) or RGB (HxWx3) array. Shares the coefficient pipeline with
    encode_jpeg, so both entropy paths carry identical coefficients —
    the cross-equality the tests pin. Emits an explicit DAC segment
    (conditioning defaults L=0 / U=1 / Kx=5 unless overridden)."""
    if not (0 <= dc_l <= 15 and 0 <= dc_u <= 15 and dc_l <= dc_u):
        raise ValueError("bad DC conditioning bounds")
    if not (1 <= ac_kx <= 63):
        raise ValueError("bad AC conditioning Kx")
    height, width, ncomp, samp, hmax, vmax, planes, quants = _prepare_planes(
        arr, subsample
    )
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload)

    for tq, q in enumerate(quants):
        zzq = bytes(int(q[r, c]) for r, c in ZIGZAG)
        seg(0xDB, bytes([tq]) + zzq)
    comps = b""
    for ci in range(ncomp):
        h, v = samp[ci]
        comps += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    seg(0xC9, struct.pack(">BHHB", 8, height, width, ncomp) + comps)
    ntab = 2 if ncomp == 3 else 1
    dacseg = b""
    for t in range(ntab):
        dacseg += bytes([t, (dc_u << 4) | dc_l])  # Tc=0 (DC)
        dacseg += bytes([0x10 | t, ac_kx])  # Tc=1 (AC)
    seg(0xCC, dacseg)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    padded = _padded_planes(planes, samp, hmax, vmax, width, height, mcus_x, mcus_y)
    qzz = [
        _quantize_blocks(padded[ci], quants[0 if ci == 0 else 1])
        for ci in range(ncomp)
    ]

    enc = _ArithEncoder()
    dc_stats = {t: bytearray(_DC_BINS) for t in range(ntab)}
    ac_stats = {t: bytearray(_AC_BINS) for t in range(ntab)}
    dc_ctx = [0] * ncomp
    last_dc = [0] * ncomp
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out.extend(enc.flush())
                out.extend(bytes([0xFF, 0xD0 + rst_n]))
                rst_n = (rst_n + 1) % 8
                enc = _ArithEncoder()
                dc_stats = {t: bytearray(_DC_BINS) for t in range(ntab)}
                ac_stats = {t: bytearray(_AC_BINS) for t in range(ntab)}
                dc_ctx = [0] * ncomp
                last_dc = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                h, v = samp[ci]
                t = 0 if ci == 0 else 1
                for by in range(v):
                    for bx in range(h):
                        zz = qzz[ci][my * v + by, mx * h + bx]
                        dc = int(zz[0])
                        _encode_dc(
                            enc, dc_stats[t], dc_ctx, ci, dc - last_dc[ci],
                            dc_l, dc_u,
                        )
                        last_dc[ci] = dc
                        _encode_ac(enc, ac_stats[t], zz, ac_kx)
    out.extend(enc.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive arithmetic (SOF10): T.81 G.1.3 / G.2 models
# ---------------------------------------------------------------------------


def decode_arith_progressive_scan(
    data, pos, frame, scan, dac, restart_interval, coef, ss, se, ah, al
):
    """Decode one progressive-arithmetic scan's entropy data in place
    (T.81 G.2): DC first = the sequential DC model on point-transformed
    diffs; DC refinement = one fixed-bin bit per block; AC first = the
    sequential AC model band-limited with values << Al; AC refinement =
    per-k EOB decisions gated past EOBx (last nonzero of the previous
    stage), correction bits on bin 3(k-1)+2, newly-nonzero on 3(k-1)+1
    with a fixed-bin sign. Statistics reset per scan and at restarts
    (each scan is an independent entropy segment). Returns the position
    of the terminating marker."""
    from .jpeg import _grid, _nonint_grid  # noqa: PLC0415

    width, height, ncomp, comps = frame
    hmax, vmax, mcus_x, mcus_y = _grid(frame)
    cidx = {c[0]: i for i, c in enumerate(comps)}
    members = [(cidx[cs], td, ta) for cs, td, ta in scan]
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not is_dc and (se < ss or se > 63):
        raise ValueError("invalid progressive spectral band")
    if ah not in (0, al + 1) or al > 13:
        raise ValueError("invalid successive-approximation parameters")
    if not is_dc and len(members) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")

    if len(members) > 1:
        n_units = mcus_x * mcus_y
        member_geom = [
            (ci, td, ta, comps[ci][1], comps[ci][2]) for ci, td, ta in members
        ]

        def blocks_of_unit(unit_no):
            my, mx = divmod(unit_no, mcus_x)
            return [
                (ci, td, ta, my * v + by, mx * h + bx)
                for ci, td, ta, h, v in member_geom
                for by in range(v)
                for bx in range(h)
            ]

    else:
        ci0, td0, ta0 = members[0]
        _bh, bw0 = _nonint_grid(frame, ci0)
        n_units = _bh * bw0

        def blocks_of_unit(unit_no):
            by, bx = divmod(unit_no, bw0)
            return ((ci0, td0, ta0, by, bx),)

    dec = _ArithDecoder(data, pos)

    def fresh_stats():
        dc_s = {td: bytearray(_DC_BINS) for _ci, td, _ta in members}
        ac_s = {ta: bytearray(_AC_BINS) for _ci, _td, ta in members}
        return dc_s, ac_s

    dc_stats, ac_stats = fresh_stats()
    dc_ctx = [0] * ncomp
    last_dc = [0] * ncomp
    p1 = 1 << al
    m1 = -(1 << al)
    for unit_no in range(n_units):
        if restart_interval and unit_no and unit_no % restart_interval == 0:
            dec.restart()
            dc_stats, ac_stats = fresh_stats()
            dc_ctx = [0] * ncomp
            last_dc = [0] * ncomp
        for ci, td, ta, by, bx in blocks_of_unit(unit_no):
            zz = coef[ci][by, bx]
            if is_dc and ah == 0:  # DC first (G.2.1 = F.2.4.1 on diffs)
                dl, du = dac.get(("dc", td), (0, 1))
                diff = _decode_dc(dec, dc_stats[td], dc_ctx, ci, dl, du)
                last_dc[ci] += diff
                zz[0] = last_dc[ci] << al
            elif is_dc:  # DC refinement: one fixed-bin bit per block
                if dec.decode_fixed():
                    zz[0] = int(zz[0]) | p1
            elif ah == 0:  # AC first: sequential AC model, band-limited
                st = ac_stats[ta]
                kx = dac.get(("ac", ta), 5)
                k = ss
                while k <= se:
                    s = 3 * (k - 1)
                    if dec.decode(st, s):
                        break  # EOB: rest of the band is zero
                    while dec.decode(st, s + 1) == 0:
                        s += 3
                        k += 1
                        if k > se:
                            raise ValueError("arith AC run past band end")
                    sign = dec.decode_fixed()
                    s += 2
                    m = dec.decode(st, s)
                    if m:
                        if dec.decode(st, s):
                            m <<= 1
                            s = 189 if k <= kx else 217
                            while dec.decode(st, s):
                                m <<= 1
                                if m == 0x8000:
                                    raise ValueError(
                                        "arith AC magnitude overflow"
                                    )
                                s += 1
                    v = m
                    s += 14
                    while m := m >> 1:
                        if dec.decode(st, s):
                            v |= m
                    v += 1
                    zz[k] = (-v if sign else v) << al
                    k += 1
            else:  # AC refinement (G.2.3)
                st = ac_stats[ta]
                kex = 0
                for kk in range(se, 0, -1):
                    if zz[kk]:
                        kex = kk
                        break
                k = ss
                while k <= se:
                    s = 3 * (k - 1)
                    if k > kex and dec.decode(st, s):
                        break  # EOB decision
                    while True:
                        c = int(zz[k])
                        if c:
                            if dec.decode(st, s + 2):
                                zz[k] = c + (p1 if c > 0 else m1)
                            break
                        if dec.decode(st, s + 1):
                            zz[k] = m1 if dec.decode_fixed() else p1
                            break
                        s += 3
                        k += 1
                        if k > se:
                            raise ValueError("arith AC refine run overflow")
                    k += 1
    return _terminating_marker_pos(dec)


def _terminating_marker_pos(dec: _ArithDecoder) -> int:
    """Position of the 0xFF that begins the marker ending this scan —
    either already consumed into the decoder's lookahead, or still
    ahead of its read position (fill 0xFFs before markers tolerated)."""
    if dec.marker:
        return dec.marker_pos
    d, n = dec.data, len(dec.data)
    p = dec.pos
    while p < n:
        if d[p] == 0xFF and p + 1 < n and d[p + 1] not in (0x00, 0xFF):
            return p
        p += 1
    return n


def encode_jpeg_arith_progressive(
    arr: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    dc_l: int = 0,
    dc_u: int = 1,
    ac_kx: int = 5,
) -> bytes:
    """Progressive-arithmetic (SOF10) JPEG with the same libjpeg-shaped
    scan script as encode_jpeg_progressive — interleaved DC first
    (Al=1), banded AC first scans with successive approximation, AC and
    DC refinement passes. Coefficients are identical to encode_jpeg /
    encode_jpeg_arith of the same array, so all four entropy
    organizations decode to identical pixels (test-pinned)."""
    height, width, ncomp, samp, hmax, vmax, planes, quants = _prepare_planes(
        arr, subsample
    )
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    padded = _padded_planes(planes, samp, hmax, vmax, width, height, mcus_x, mcus_y)
    zzs = [
        _quantize_blocks(padded[ci], quants[0 if ci == 0 else 1])
        for ci in range(ncomp)
    ]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload)

    for tq, q in enumerate(quants):
        seg(0xDB, bytes([tq]) + bytes(int(q[r, c]) for r, c in ZIGZAG))
    compdef = b""
    for ci in range(ncomp):
        h, v = samp[ci]
        compdef += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    seg(0xCA, struct.pack(">BHHB", 8, height, width, ncomp) + compdef)
    ntab = 2 if ncomp == 3 else 1
    dacseg = b""
    for t in range(ntab):
        dacseg += bytes([t, (dc_u << 4) | dc_l])
        dacseg += bytes([0x10 | t, ac_kx])
    seg(0xCC, dacseg)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    if ncomp == 3:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    nonint = []
    for ci in range(ncomp):
        h, v = samp[ci]
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        nonint.append(((ch + 7) // 8, (cw + 7) // 8))

    for members, sss, sse, sah, sal in script:
        sos = bytes([len(members)])
        for ci in members:
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([sss, sse, (sah << 4) | sal])
        seg(0xDA, sos)
        out.extend(
            _encode_arith_progressive_scan(
                zzs, members, samp, (mcus_x, mcus_y), nonint,
                sss, sse, sah, sal, ncomp, restart_interval,
                dc_l, dc_u, ac_kx,
            )
        )
    out.extend(b"\xff\xd9")
    return bytes(out)


def _encode_arith_progressive_scan(
    zzs, members, samp, frame_grid, nonint, ss, se, ah, al, ncomp,
    restart_interval, dc_l, dc_u, ac_kx,
) -> bytes:
    mcus_x, mcus_y = frame_grid
    is_dc = ss == 0

    def units():
        if len(members) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks = []
                    for ci in members:
                        h, v = samp[ci]
                        for by in range(v):
                            for bx in range(h):
                                blocks.append((ci, my * v + by, mx * h + bx))
                    yield blocks
        else:
            ci = members[0]
            bh, bw = nonint[ci]
            for by in range(bh):
                for bx in range(bw):
                    yield [(ci, by, bx)]

    def fresh():
        enc_ = _ArithEncoder()
        dc_s = {0 if ci == 0 else 1: bytearray(_DC_BINS) for ci in members}
        ac_s = {0 if ci == 0 else 1: bytearray(_AC_BINS) for ci in members}
        return enc_, dc_s, ac_s

    enc, dc_stats, ac_stats = fresh()
    dc_ctx = [0] * ncomp
    last_dc = [0] * ncomp
    chunks = bytearray()
    rst_n = 0
    unit_no = 0
    for blocks in units():
        if restart_interval and unit_no and unit_no % restart_interval == 0:
            chunks.extend(enc.flush())
            chunks.extend(bytes([0xFF, 0xD0 + rst_n]))
            rst_n = (rst_n + 1) % 8
            enc, dc_stats, ac_stats = fresh()
            dc_ctx = [0] * ncomp
            last_dc = [0] * ncomp
        unit_no += 1
        for ci, by, bx in blocks:
            zz = zzs[ci][by, bx]
            t = 0 if ci == 0 else 1
            if is_dc and ah == 0:  # DC first
                dc = int(zz[0]) >> al  # DC point transform
                _encode_dc(
                    enc, dc_stats[t], dc_ctx, ci, dc - last_dc[ci], dc_l, dc_u
                )
                last_dc[ci] = dc
            elif is_dc:  # DC refinement: the Al bit, fixed bin
                enc.encode_fixed((int(zz[0]) >> al) & 1)
            elif ah == 0:  # AC first
                _enc_arith_ac_first(enc, ac_stats[t], zz, ss, se, al, ac_kx)
            else:  # AC refinement
                _enc_arith_ac_refine(enc, ac_stats[t], zz, ss, se, ah, al)
    chunks.extend(enc.flush())
    return bytes(chunks)


def _pt(c: int, al: int) -> int:
    """AC point transform: toward-zero integer division by 2^al."""
    return (abs(c) >> al) * (1 if c >= 0 else -1)


def _enc_arith_ac_first(enc, st, zz, ss, se, al, kx):
    ke = 0
    for k in range(se, ss - 1, -1):
        if abs(int(zz[k])) >> al:
            ke = k
            break
    k = ss
    while k <= ke:
        s = 3 * (k - 1)
        enc.encode(st, s, 0)  # not EOB
        v = _pt(int(zz[k]), al)
        while v == 0:
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
            v = _pt(int(zz[k]), al)
        enc.encode(st, s + 1, 1)
        if v > 0:
            enc.encode_fixed(0)
        else:
            v = -v
            enc.encode_fixed(1)
        s += 2
        m = 0
        vm = v - 1
        if vm:
            enc.encode(st, s, 1)
            m = 1
            v2 = vm
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, s, 1)
                m <<= 1
                s = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
        enc.encode(st, s, 0)
        s += 14
        while m := m >> 1:
            enc.encode(st, s, 1 if (m & vm) else 0)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _enc_arith_ac_refine(enc, st, zz, ss, se, ah, al):
    # ke: end of band at THIS stage's precision; kex: at the previous
    # stage's (G.1.3.3) — EOB decisions are coded only past kex
    ke = 0
    for k in range(se, 0, -1):
        if abs(int(zz[k])) >> al:
            ke = k
            break
    kex = 0
    for k in range(ke, 0, -1):
        if abs(int(zz[k])) >> ah:
            kex = k
            break
    k = ss
    while k <= ke:
        s = 3 * (k - 1)
        if k > kex:
            enc.encode(st, s, 0)  # EOB decision: not yet
        while True:
            c = int(zz[k])
            v = abs(c) >> al
            if v:
                if v >> 1:  # previously nonzero: correction bit
                    enc.encode(st, s + 2, v & 1)
                else:  # newly nonzero at this stage
                    enc.encode(st, s + 1, 1)
                    enc.encode_fixed(0 if c > 0 else 1)
                break
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB
