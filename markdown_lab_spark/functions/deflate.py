"""From-scratch DEFLATE/zlib/gzip decoder (RFC 1951/1950/1952).

Completes the engine's ownership of the archive byte path: the classic
Common-Crawl ``.warc.gz`` member layout decodes through in-repo code,
not just the stdlib. Verification posture matches the other
compression codecs — every decoder is exercised against genuinely
foreign bitstreams (stdlib ``zlib``/``gzip`` output at every
compression level and strategy) and the store-mode encoder twins are
verified by the real library decoding our streams; CRC-32 and
Adler-32 are pinned against ``zlib.crc32``/``zlib.adler32``
(tests/test_compression.py).

Implemented: stored, fixed-Huffman and dynamic-Huffman blocks, the
code-length alphabet with its 16/17/18 repeat codes and the permuted
order, canonical code construction, full length/distance extra-bit
tables, overlapping match copies, the zlib wrapper (header checks +
Adler-32 trailer), and the gzip wrapper (FEXTRA/FNAME/FCOMMENT/FHCRC
fields, CRC-32 + ISIZE trailer, concatenated members). Preset
dictionaries are rejected explicitly.
"""

from __future__ import annotations


class DeflateError(ValueError):
    pass


# ---------------------------------------------------------------------------
# checksums (verified against zlib's)


def _crc32_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _crc32_table()


def crc32(data: bytes, value: int = 0) -> int:
    c = value ^ 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def adler32(data: bytes, value: int = 1) -> int:
    a = value & 0xFFFF
    b = (value >> 16) & 0xFFFF
    pos = 0
    n = len(data)
    while pos < n:  # modulo every 5552 bytes keeps sums in 32 bits
        for byte in data[pos : pos + 5552]:
            a += byte
            b += a
        a %= 65521
        b %= 65521
        pos += 5552
    return (b << 16) | a


# ---------------------------------------------------------------------------
# bit reader (LSB-first, as DEFLATE packs)


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # bit position

    def read(self, n: int) -> int:
        start = self.pos
        end = start + n
        if end > len(self.data) * 8:
            raise DeflateError("deflate stream truncated")
        chunk = self.data[start // 8 : (end + 7) // 8]
        val = int.from_bytes(chunk, "little") >> (start % 8)
        self.pos = end
        return val & ((1 << n) - 1)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _Huff:
    """Canonical Huffman decoder: full 2^maxlen lookup table keyed by
    LSB-first-read bits (DEFLATE stores codes MSB-first, so table
    indices are the bit-reversed codes)."""

    __slots__ = ("maxlen", "symbols", "lengths")

    def __init__(self, code_lengths: list[int]) -> None:
        maxlen = max(code_lengths, default=0)
        if maxlen == 0:
            raise DeflateError("empty huffman alphabet")
        if maxlen > 15:
            raise DeflateError("huffman code too long")
        counts = [0] * (maxlen + 1)
        for length in code_lengths:
            counts[length] += 1
        counts[0] = 0
        code = 0
        next_code = [0] * (maxlen + 1)
        total = 0
        for bits in range(1, maxlen + 1):
            code = (code + counts[bits - 1]) << 1
            next_code[bits] = code
            total += counts[bits] << (maxlen - bits)
        if total > (1 << maxlen):
            raise DeflateError("over-subscribed huffman code")
        size = 1 << maxlen
        self.maxlen = maxlen
        self.symbols = [0] * size
        self.lengths = [0] * size
        for sym, length in enumerate(code_lengths):
            if length == 0:
                continue
            c = next_code[length]
            next_code[length] += 1
            rev = int(f"{c:0{length}b}"[::-1], 2)  # LSB-first index
            step = 1 << length
            for idx in range(rev, size, step):
                self.symbols[idx] = sym
                self.lengths[idx] = length

    def decode(self, bits: _Bits) -> int:
        start = bits.pos
        end = start + self.maxlen
        avail = len(bits.data) * 8
        if end > avail:
            end = avail
        chunk = bits.data[start // 8 : (end + 7) // 8]
        idx = (int.from_bytes(chunk, "little") >> (start % 8)) & (
            (1 << self.maxlen) - 1
        )
        length = self.lengths[idx]
        if length == 0 or start + length > avail:
            raise DeflateError("invalid huffman code")
        bits.pos = start + length
        return self.symbols[idx]


_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35,
             43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
              4, 4, 4, 4, 5, 5, 5, 5, 0]
_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
              257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
              8193, 12289, 16385, 24577]
_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
               9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
_CLEN_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14,
               1, 15]

_FIXED_LIT = _Huff([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
_FIXED_DIST = _Huff([5] * 30 + [5, 5])


def inflate_raw(data: bytes, start_bit: int = 0) -> tuple[bytearray, int]:
    """Decode a raw DEFLATE stream; returns (output, bits consumed end
    position) so wrappers can locate their trailers."""
    bits = _Bits(data, start_bit)
    out = bytearray()
    while True:
        bfinal = bits.read(1)
        btype = bits.read(2)
        if btype == 0:  # stored
            bits.align()
            pos = bits.pos // 8
            if pos + 4 > len(data):
                raise DeflateError("truncated stored block header")
            length = int.from_bytes(data[pos : pos + 2], "little")
            nlen = int.from_bytes(data[pos + 2 : pos + 4], "little")
            if length ^ nlen != 0xFFFF:
                raise DeflateError("stored block LEN/NLEN mismatch")
            if pos + 4 + length > len(data):
                raise DeflateError("truncated stored block")
            out += data[pos + 4 : pos + 4 + length]
            bits.pos = (pos + 4 + length) * 8
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _FIXED_LIT, _FIXED_DIST
            else:
                hlit = bits.read(5) + 257
                hdist = bits.read(5) + 1
                hclen = bits.read(4) + 4
                clen_lengths = [0] * 19
                for i in range(hclen):
                    clen_lengths[_CLEN_ORDER[i]] = bits.read(3)
                clen = _Huff(clen_lengths)
                lengths: list[int] = []
                while len(lengths) < hlit + hdist:
                    sym = clen.decode(bits)
                    if sym < 16:
                        lengths.append(sym)
                    elif sym == 16:
                        if not lengths:
                            raise DeflateError("repeat with no previous")
                        lengths += [lengths[-1]] * (3 + bits.read(2))
                    elif sym == 17:
                        lengths += [0] * (3 + bits.read(3))
                    else:
                        lengths += [0] * (11 + bits.read(7))
                if len(lengths) != hlit + hdist:
                    raise DeflateError("code length overrun")
                lit = _Huff(lengths[:hlit])
                dist = _Huff(lengths[hlit:]) if any(
                    lengths[hlit:]
                ) else None
            while True:
                sym = lit.decode(bits)
                if sym < 256:
                    out.append(sym)
                    continue
                if sym == 256:
                    break
                if sym > 285:
                    raise DeflateError("invalid length symbol")
                length = _LEN_BASE[sym - 257] + bits.read(
                    _LEN_EXTRA[sym - 257]
                )
                if dist is None:
                    raise DeflateError("match with empty distance alphabet")
                dsym = dist.decode(bits)
                if dsym > 29:
                    raise DeflateError("invalid distance symbol")
                d = _DIST_BASE[dsym] + bits.read(_DIST_EXTRA[dsym])
                if d > len(out):
                    raise DeflateError("distance beyond window")
                if d >= length:
                    s = len(out) - d
                    out += out[s : s + length]
                else:
                    pattern = bytes(out[len(out) - d :])
                    out += (pattern * (length // d + 1))[:length]
        else:
            raise DeflateError("reserved block type")
        if bfinal:
            return out, bits.pos


def decode_zlib(payload: bytes, verify_checksum: bool = True) -> bytes:
    """RFC 1950: zlib wrapper around a DEFLATE stream."""
    if len(payload) < 6:
        raise DeflateError("zlib stream too short")
    cmf, flg = payload[0], payload[1]
    if cmf & 0x0F != 8:
        raise DeflateError("zlib CM is not deflate")
    if (cmf << 8 | flg) % 31 != 0:
        raise DeflateError("zlib header check failed")
    if flg & 0x20:
        raise DeflateError("preset dictionaries are not supported")
    out, end_bit = inflate_raw(payload, 16)
    pos = (end_bit + 7) // 8
    if len(payload) < pos + 4:
        raise DeflateError("truncated adler32 trailer")
    if verify_checksum:
        want = int.from_bytes(payload[pos : pos + 4], "big")
        if adler32(bytes(out)) != want:
            raise DeflateError("adler32 mismatch")
    return bytes(out)


def is_gzip(payload: bytes) -> bool:
    return payload[:2] == b"\x1f\x8b"


def decode_gzip(payload: bytes, verify_checksum: bool = True) -> bytes:
    """RFC 1952: gzip members (concatenated members supported, as in
    ``.warc.gz``)."""
    out = bytearray()
    pos = 0
    n = len(payload)
    while pos < n:
        if n - pos < 10:
            raise DeflateError("truncated gzip header")
        if payload[pos : pos + 2] != b"\x1f\x8b":
            raise DeflateError("bad gzip magic")
        if payload[pos + 2] != 8:
            raise DeflateError("gzip CM is not deflate")
        flg = payload[pos + 3]
        if flg & 0xE0:
            raise DeflateError("reserved gzip FLG bits set")
        hdr_start = pos
        pos += 10
        if flg & 0x04:  # FEXTRA
            xlen = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2 + xlen
        if flg & 0x08:  # FNAME
            pos = payload.index(b"\0", pos) + 1
        if flg & 0x10:  # FCOMMENT
            pos = payload.index(b"\0", pos) + 1
        if flg & 0x02:  # FHCRC
            want = int.from_bytes(payload[pos : pos + 2], "little")
            if verify_checksum:
                if crc32(payload[hdr_start:pos]) & 0xFFFF != want:
                    raise DeflateError("gzip header crc mismatch")
            pos += 2
        member, end_bit = inflate_raw(payload, pos * 8)
        pos = (end_bit + 7) // 8
        if n - pos < 8:
            raise DeflateError("truncated gzip trailer")
        want_crc = int.from_bytes(payload[pos : pos + 4], "little")
        want_isize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        pos += 8
        if verify_checksum:
            if crc32(bytes(member)) != want_crc:
                raise DeflateError("gzip crc32 mismatch")
            if len(member) & 0xFFFFFFFF != want_isize:
                raise DeflateError("gzip ISIZE mismatch")
        out += member
    return bytes(out)


# ---------------------------------------------------------------------------
# store-mode encoder twins


def deflate_store(content: bytes) -> bytes:
    """Raw DEFLATE using stored blocks only (spec-legal)."""
    parts = []
    blocks = [content[i : i + 0xFFFF] for i in range(0, len(content), 0xFFFF)]
    if not blocks:
        blocks = [b""]
    for i, block in enumerate(blocks):
        final = 1 if i == len(blocks) - 1 else 0
        parts.append(bytes([final]))  # BFINAL + BTYPE=00 + align padding
        parts.append(len(block).to_bytes(2, "little"))
        parts.append((len(block) ^ 0xFFFF).to_bytes(2, "little"))
        parts.append(block)
    return b"".join(parts)


def encode_gzip_store(content: bytes) -> bytes:
    """One gzip member with stored deflate blocks; deterministic
    (MTIME pinned to 0)."""
    header = b"\x1f\x8b\x08\x00" + b"\x00" * 4 + b"\x00\xff"
    trailer = crc32(content).to_bytes(4, "little") + (
        len(content) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    return header + deflate_store(content) + trailer


def encode_zlib_store(content: bytes) -> bytes:
    cmf = 0x78
    flg = (31 - (cmf << 8) % 31) % 31  # level bits 0, no dict
    return (
        bytes([cmf, flg])
        + deflate_store(content)
        + adler32(content).to_bytes(4, "big")
    )
